"""Message-bus source -> transform -> message-bus sink — the jar-free
twin of the reference's Kafka example (malstrom-kafka/examples/
source_sink.rs: consume a topic, transform, produce to another topic,
offsets snapshot-committed). Here the bus is the file-backed
partitioned log from malstrom_spark/sources/bus.py: same
topic/partition/offset contract, checkpoint-WAL recovery, async
group-offset commits; swap `malstrom_bus` for `kafka` + a connector
jar and the pipeline is the production one."""

import shutil

from pyspark.sql import functions as F

from malstrom_spark.sources.bus import (
    bus_produce,
    bus_sink,
    committed_offsets,
    register_message_bus_source,
)


def main(spark, tmp_dir="/tmp/malstrom_example_bus"):
    shutil.rmtree(tmp_dir, ignore_errors=True)
    bus = f"{tmp_dir}/bus"

    # producer seeds the input topic (two epochs = two log segments)
    orders = spark.range(50).select(
        F.concat(F.lit("user"), (F.col("id") % 5)).alias("key"),
        F.concat(F.lit("order-"), F.col("id")).alias("value"),
    )
    bus_produce(orders, bus, "orders", epoch_id=0)

    # consume -> transform -> produce to the output topic
    register_message_bus_source(spark)
    sdf = (
        spark.readStream.format("malstrom_bus")
        .option("path", bus)
        .option("topic", "orders")
        .load()
    )
    shouted = sdf.select("key", F.upper("value").alias("value"))
    q = bus_sink(
        shouted, bus, "orders_upper", f"{tmp_dir}/ckpt", trigger_available_now=True
    )
    q.awaitTermination()

    # read the output topic back (fresh consumer group)
    out = (
        spark.readStream.format("malstrom_bus")
        .option("path", bus)
        .option("topic", "orders_upper")
        .load()
    )
    q2 = (
        out.writeStream.format("memory")
        .queryName("bus_example")
        .option("checkpointLocation", f"{tmp_dir}/ckpt2")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()
    got = spark.sql("select * from bus_example").collect()
    assert len(got) == 50
    assert all(r.value.startswith("ORDER-") for r in got)
    # same key -> same partition (the keyed-producer contract)
    parts = {}
    for r in got:
        parts.setdefault(r.key, set()).add(r.partition)
    assert all(len(p) == 1 for p in parts.values())
    return {"messages": len(got), "committed": committed_offsets(bus, "orders")}


if __name__ == "__main__":
    from malstrom_spark.session import build_session

    print(main(build_session(app_name="example-bus")))
