"""Pure-Python xxhash64 ≡ Spark F.xxhash64 (doc identity contract)."""

from pyspark.sql import functions as F

from searchengine_spark.functions.docid import xxhash64


def test_xxhash64_matches_spark(spark):
    samples = [
        "", "a", "abc", "https://site0.example/page0", "x" * 7, "y" * 8,
        "z" * 31, "w" * 32, "q" * 100, "привет мир", "данные/индекс?x=1",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert xxhash64(r["s"]) == r["h"], repr(r["s"])
