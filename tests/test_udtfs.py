from __future__ import annotations

from frontmatter_mcp_spark.functions.udtfs import register_udtfs


def test_split_sentences_lateral(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "Hello world. How are you? Fine!"), (2, "One sentence")],
        "id int, body string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT id, s.sentence, s.n_words, s.idx FROM udtf_docs, LATERAL split_sentences(body) s"
    ).collect()
    got = {(r.id, r.idx): (r.sentence, r.n_words) for r in rows}
    assert got[(1, 0)] == ("Hello world", 2)
    assert got[(1, 2)] == ("Fine", 1)
    assert got[(2, 0)] == ("One sentence", 2)


def test_explode_key_values(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM explode_key_values('lang=en; score=0.9;bad;x=1')"
    ).collect()
    assert {(r.key, r.value) for r in rows} == {("lang", "en"), ("score", "0.9"), ("x", "1")}
