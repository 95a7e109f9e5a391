"""SQL-UDF surface (engine analogue of the reference's `osci exec`
extensibility, A30): register + call from plain SQL; cross-check against
the DataFrame implementations and a NumPy oracle."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from one_stop_cdc_ingestion_toolkit_spark.functions import register_sql_functions
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def funcs(spark):
    return register_sql_functions(spark)


def test_registration(funcs):
    assert funcs == ["cosine_sim", "dot_product", "text_fingerprint", "token_count"]


def test_cosine_sim_matches_numpy(spark, funcs):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb.createOrReplaceTempView("emb")
    rows = spark.sql(
        """SELECT a.vec_id AS ia, b.vec_id AS ib,
                  cosine_sim(a.embedding, b.embedding) AS sim,
                  a.embedding AS ea, b.embedding AS eb
           FROM emb a JOIN emb b ON a.vec_id < 5 AND b.vec_id BETWEEN 5 AND 9"""
    ).collect()
    assert rows
    for r in rows:
        a = np.array(r["ea"], dtype=np.float64)
        b = np.array(r["eb"], dtype=np.float64)
        expect = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert math.isclose(r["sim"], expect, rel_tol=1e-9)


def test_token_count_and_fingerprint(spark, funcs):
    df = spark.createDataFrame(
        [("  hello   world  ",), ("one two three four",)], "t string"
    )
    df.createOrReplaceTempView("t_docs")
    got = spark.sql(
        "SELECT token_count(t) AS n, text_fingerprint(t) AS fp FROM t_docs"
    ).collect()
    assert [r["n"] for r in got] == [2, 4]
    # fingerprint is whitespace-normalization invariant
    fp2 = spark.sql("SELECT text_fingerprint('hello world') AS fp").first()["fp"]
    assert got[0]["fp"] == fp2


def test_dot_product_sql(spark, funcs):
    got = spark.sql(
        "SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), "
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d"
    ).first()["d"]
    assert got == 11.0


def test_udtf_text_chunks_sql_lateral(spark):
    from one_stop_cdc_ingestion_toolkit_spark.functions.udtfs import register_udtfs

    assert register_udtfs(spark) == ["text_chunks"]
    spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("u_docs")
    rows = spark.sql(
        "SELECT doc_id, tc.chunk_id, tc.n_tokens, tc.chunk "
        "FROM u_docs, LATERAL text_chunks(text, 3, 1) tc "
        "ORDER BY doc_id, tc.chunk_id"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["n_tokens"], r["chunk"]))
    # doc 1: 7 tokens, size 3 overlap 1 -> step 2: windows at 0, 2, 4;
    # the window at 4 reaches the last token, so no trailing stub chunk
    assert by_doc[1] == [
        (0, 3, "a b c"),
        (1, 3, "c d e"),
        (2, 3, "e f g"),
    ]
    assert by_doc[2] == [(0, 2, "x y")]
    assert 3 not in by_doc  # NULL text yields no rows
    # coverage: union of chunk tokens == document tokens
    covered = {t for c in by_doc[1] for t in c[2].split()}
    assert covered == set("a b c d e f g".split())


def test_udtf_overlap_guard(spark):
    from one_stop_cdc_ingestion_toolkit_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    import pytest as _pytest

    with _pytest.raises(Exception, match="overlap"):
        spark.sql("SELECT * FROM text_chunks('a b c', 2, 2)").collect()
    # negative overlap would silently drop tokens between windows
    # (advisory r3): must be rejected, not accepted with step > size
    with _pytest.raises(Exception, match="overlap"):
        spark.sql("SELECT * FROM text_chunks('a b c d', 2, -1)").collect()
