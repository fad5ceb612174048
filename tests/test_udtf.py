"""Python UDTF surface (SURVEY §2.8): the reference's entire operator
surface is user closures; Spark's escape hatches are pandas UDFs
(covered elsewhere) and Python UDTFs — 1->N table functions usable
from both the DataFrame API and SQL LATERAL joins."""

from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf


@udtf(returnType="word string, pos int")
class SplitWords:
    def eval(self, text: str):
        if text:
            for i, w in enumerate(text.split()):
                yield w, i


def test_udtf_dataframe_api(spark):
    out = SplitWords(lit("alpha beta gamma")).collect()
    assert [(r.word, r.pos) for r in out] == [("alpha", 0), ("beta", 1), ("gamma", 2)]


def test_udtf_sql_lateral(spark):
    spark.udtf.register("split_words", SplitWords)
    df = spark.createDataFrame([(1, "a b"), (2, "c")], "id int, txt string")
    df.createOrReplaceTempView("docs_udtf")
    out = spark.sql(
        """
        SELECT id, word, pos FROM docs_udtf,
        LATERAL split_words(txt)
        ORDER BY id, pos
        """
    ).collect()
    assert [(r.id, r.word, r.pos) for r in out] == [(1, "a", 0), (1, "b", 1), (2, "c", 0)]
