"""Keyed state — reference examples/keyed_streams.rs,
stateful_programs.rs, stateful_program_multiple_keys.rs: distribute
records onto keys, fold per-key running state (bank-account style),
multiple keys advancing independently."""

from pyspark.sql import functions as F

from malstrom_spark.sources import iterator_source
from malstrom_spark.stream import Stream


def main(spark):
    deposits = [("alice", 10.0), ("bob", 5.0), ("alice", 7.0), ("bob", 1.0), ("alice", 3.0)]
    src = iterator_source(spark, deposits, "account string, amount double")
    s = Stream.from_df(src, ts_col="seq").key_distribute(F.col("account"), "account")
    balances = s.running_agg(order_by=["seq"], aggs={"balance": F.sum("amount")})
    got = {(r.account, r.seq): r.balance for r in balances.collect()}
    # each key's balance advances independently, in arrival order
    assert got[("alice", 0)] == 10.0 and got[("alice", 2)] == 17.0 and got[("alice", 4)] == 20.0
    assert got[("bob", 1)] == 5.0 and got[("bob", 3)] == 6.0

    # arbitrary per-record fold with state eviction (stateful_map.rs:
    # 74-77 None-drops-state semantics): withdraw everything when the
    # balance crosses 15
    def cashout(key, row, state):
        bal = (state or 0.0) + row["amount"]
        if bal >= 15.0:
            return {"account": key[0], "event": "cashout", "paid": bal}, None
        return None, bal

    events = s.stateful_map(
        ["seq"], cashout, "account string, event string, paid double"
    )
    paid = {(r.account, r.paid) for r in events.collect()}
    assert paid == {("alice", 17.0)}, paid  # alice crosses 15 at seq 2; bob never does
    return {"accounts": 2, "cashouts": len(paid)}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-keyed")))
