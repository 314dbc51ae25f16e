"""NULL/degenerate-text oracle sweep — class-level protection for the
"exact SQL twin" contract on dirty data.

The driver testdata contains no NULL text/lang/source rows, so every
per-round oracle sweep is blind to NULL-semantics divergences between
Spark expressions and their DuckDB twins (round 3 found EIGHT in one
probe: DuckDB concat() ignoring NULL args vs Spark propagating, Spark
least/greatest skipping NULLs into garbage scores, NULL-key join drops
vs window counts, encode(NULL) vs the fake kernels' None branches).
This sweep runs every documents-family oracled query against a
null-injected corpus so the whole class stays fixed.

Contract pinned here (operator docstrings carry the details):
  - text analysis scalars (stats, langid, quality, rules) NULL-propagate;
  - fingerprint duplicate-counting excludes NULL fingerprints;
  - media kernels treat NULL content as an empty payload;
  - chunking emits no chunks for NULL text.
"""

import pytest


@pytest.fixture(scope="module")
def null_fix(spark, sf_dir, tmp_path_factory):
    import shutil
    fix = str(tmp_path_factory.mktemp("nullfix"))
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    extra = spark.createDataFrame(
        [(900001, None, "en", "web", 0),      # NULL text
         (900002, "", "en", None, 0),         # empty text, NULL source
         (900003, "   ", None, "books", 3),   # whitespace text, NULL lang
         (900004, "a b c", "en", "web", 5)],  # short control row
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    (d.unionByName(extra).coalesce(1)
     .write.mode("overwrite").parquet(f"{fix}/documents.parquet"))
    for t in ("embeddings", "events", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{fix}/{t}.parquet")
    return fix


def _doc_queries():
    from etl_load_spark.queries import QUERIES
    return sorted(n for n, q in QUERIES.items()
                  if q.oracle and "documents" in q.oracle.lower())


@pytest.mark.parametrize("name", _doc_queries())
def test_oracle_parity_on_null_injected_corpus(spark, null_fix, name):
    import duckdb
    from etl_load_spark.queries import QUERIES
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{null_fix}/documents.parquet/*.parquet'")
    for t in ("embeddings", "events", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{null_fix}/{t}.parquet'")
    q = QUERIES[name]
    srows = sorted(tuple(str(x) for x in r)
                   for r in q.fn(spark, null_fix).collect())
    drows = sorted(tuple(str(x) for x in r)
                   for r in con.sql(q.oracle).fetchall())
    assert srows == drows, (
        f"{name} diverges on the null-injected corpus: "
        f"spark-only={sorted(set(srows) - set(drows))[:3]} "
        f"duck-only={sorted(set(drows) - set(srows))[:3]}")


@pytest.fixture(scope="module")
def emb_fix(spark, sf_dir, tmp_path_factory):
    """Degenerate-embedding fixture: NULL array, zero vector, NULL label,
    EMPTY array, +inf element. (DuckDB's vectorized
    list_cosine_similarity ERRORS on a NULL element in a batch and
    scores zero-norm -1.0 where Spark's cosine is NULL; an empty array
    unnests to zero oracle rows where a naive kernel emits one; an inf
    element crashes CAST-to-BIGINT oracles and turns numpy int64 casts
    into garbage — hence the family contract: degenerate vectors are
    excluded from every similarity/quantization relation on BOTH sides,
    via valid_embeddings / quantizable_embeddings and their _sql twins,
    with the filtered CTE MATERIALIZED so DuckDB cannot push the cosine
    below the filter.)"""
    import shutil
    fix = str(tmp_path_factory.mktemp("embfix"))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(e.first()["embedding"])
    extra = spark.createDataFrame(
        [(800001, None, 0),
         (800002, [0.0] * dim, 1),
         (800003, [1.0] + [0.0] * (dim - 1), None),
         (800004, [], 2),
         (800005, [float("inf")] + [1.0] * (dim - 1), 2)],
        "vec_id long, embedding array<float>, label int")
    (e.unionByName(extra).coalesce(1)
     .write.mode("overwrite").parquet(f"{fix}/embeddings.parquet"))
    for t in ("documents", "events", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{fix}/{t}.parquet")
    return fix


def _emb_queries():
    from etl_load_spark.queries import QUERIES
    return sorted(n for n, q in QUERIES.items()
                  if q.oracle and "embeddings" in q.oracle.lower())


@pytest.mark.parametrize("name", _emb_queries())
def test_oracle_parity_on_degenerate_embeddings(spark, emb_fix, name):
    import duckdb
    from etl_load_spark.queries import QUERIES
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{emb_fix}/embeddings.parquet/*.parquet'")
    for t in ("documents", "events", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{emb_fix}/{t}.parquet'")
    q = QUERIES[name]
    srows = sorted(tuple(str(x) for x in r)
                   for r in q.fn(spark, emb_fix).collect())
    drows = sorted(tuple(str(x) for x in r)
                   for r in con.sql(q.oracle).fetchall())
    assert srows == drows, (
        f"{name} diverges on the degenerate-embedding corpus: "
        f"spark-only={sorted(set(srows) - set(drows))[:3]} "
        f"duck-only={sorted(set(drows) - set(srows))[:3]}")


def test_rows_only_similarity_ops_survive_degenerates(spark, emb_fix):
    """The rows-only ANN rungs must not crash on degenerate vectors —
    valid_embeddings filters them at every operator entry."""
    from pyspark.sql import functions as F
    from etl_load_spark.operators.similarity import (
        embedding_near_dup_pairs, ivf_topk, lsh_topk, pq_topk)
    e = spark.read.parquet(f"{emb_fix}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    assert lsh_topk(e, q, k=2).count() > 0
    assert ivf_topk(e, q, k=2, n_cells=4, n_probe=2).count() > 0
    assert pq_topk(e, q, k=2, m=8, n_codes=8).count() > 0
    embedding_near_dup_pairs(e).count()  # no crash; pairs may be empty


@pytest.fixture(scope="module")
def ev_fix(spark, sf_dir, tmp_path_factory):
    """NULL-injected events fixture: NULL user_id/props, NULL
    event_type/value, NULL ts. Contract pinned by the sweep below:
    time-keyed operators (windows, buckets, sessions, event dedup,
    epoch-ordered analytics) exclude NULL-ts rows on BOTH sides — the
    same rows Structured Streaming cannot window — while key-only
    operators (q48's stateful stats) keep them; NULL event_type cannot
    be a map key (q52 excludes it) but IS a legitimate rollup group
    (q71 joins it eqNullSafe)."""
    import datetime
    import shutil
    fix = str(tmp_path_factory.mktemp("evfix"))
    from etl_load_spark.session import read_table
    e = read_table(spark, sf_dir, "events")
    ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
    extra = spark.createDataFrame(
        [(900001, ts, None, "click", 1.5, None),
         (900002, ts, 7, None, None, '{"k":1}'),
         (900003, None, 7, "view", 2.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")
    (e.unionByName(extra).coalesce(1)
     .write.mode("overwrite").parquet(f"{fix}/events.parquet"))
    for t in ("documents", "embeddings", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{fix}/{t}.parquet")
    return fix


def _ev_queries():
    from etl_load_spark.queries import QUERIES
    return sorted(n for n, q in QUERIES.items()
                  if q.oracle and " events" in q.oracle.lower())


@pytest.mark.parametrize("name", _ev_queries())
def test_oracle_parity_on_null_injected_events(spark, ev_fix, name):
    import duckdb
    from etl_load_spark.queries import QUERIES
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"'{ev_fix}/events.parquet/*.parquet'")
    for t in ("documents", "embeddings", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{ev_fix}/{t}.parquet'")
    q = QUERIES[name]
    srows = sorted(tuple(str(x) for x in r)
                   for r in q.fn(spark, ev_fix).collect())
    drows = sorted(tuple(str(x) for x in r)
                   for r in con.sql(q.oracle).fetchall())
    assert srows == drows, (
        f"{name} diverges on the null-injected events: "
        f"spark-only={sorted(set(srows) - set(drows))[:3]} "
        f"duck-only={sorted(set(drows) - set(srows))[:3]}")


@pytest.fixture(scope="module")
def tpch_fix(spark, sf_dir, tmp_path_factory):
    """NULL-injected relational fixture: an order with NULL status/price/
    date/priority, an order with NULL custkey, a lineitem row with every
    measure NULL, a customer with all non-key columns NULL. Contract
    pinned by the sweep: standard SQL NULL semantics agree between the
    engines EXCEPT where pinned explicitly — window ORDER BY over a
    nullable column needs NULLS LAST on the Spark side (Spark sorts
    NULLs first ascending, DuckDB last), collect_set skips NULLs so
    list() twins need FILTER + COALESCE (and DuckDB's
    array_to_string([]) is NULL where Spark's array_join([]) is ''),
    an empty pivot cell counts 0, and roundtrip NULL-counting includes
    naturally-NULL rows."""
    import datetime
    import shutil
    fix = str(tmp_path_factory.mktemp("tpchfix"))
    for t in ("documents", "embeddings", "events", "region", "nation",
              "supplier", "part"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{fix}/{t}.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    oextra = spark.createDataFrame(
        [(990001, 1, None, None, None, None),
         (990002, None, "F", 1234.56, datetime.datetime(1995, 6, 1),
          "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string")
    (o.unionByName(oextra).coalesce(1)
     .write.mode("overwrite").parquet(f"{fix}/orders.parquet"))
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = {c: None for c in l.columns}
    row.update({"l_orderkey": 990001, "l_partkey": 1, "l_suppkey": 1,
                "l_linenumber": 1})
    lex = spark.createDataFrame([tuple(row[c] for c in l.columns)], l.schema)
    (l.unionByName(lex).coalesce(1)
     .write.mode("overwrite").parquet(f"{fix}/lineitem.parquet"))
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cex = spark.createDataFrame([(990001, None, None, None, None)], c.schema)
    (c.unionByName(cex).coalesce(1)
     .write.mode("overwrite").parquet(f"{fix}/customer.parquet"))
    return fix


def _rel_queries():
    from etl_load_spark.queries import QUERIES
    return sorted(n for n, q in QUERIES.items() if q.oracle and
                  any(t in q.oracle.lower()
                      for t in ("orders", "lineitem", "customer")))


@pytest.mark.parametrize("name", _rel_queries())
def test_oracle_parity_on_null_injected_relational(spark, tpch_fix, name):
    import duckdb
    from etl_load_spark.queries import QUERIES
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "region", "nation",
              "supplier", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{tpch_fix}/{t}.parquet'")
    for t in ("orders", "lineitem", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{tpch_fix}/{t}.parquet/*.parquet'")
    q = QUERIES[name]
    srows = sorted(tuple(str(x) for x in r)
                   for r in q.fn(spark, tpch_fix).collect())
    drows = sorted(tuple(str(x) for x in r)
                   for r in con.sql(q.oracle).fetchall())
    assert srows == drows, (
        f"{name} diverges on the null-injected relational fixture: "
        f"spark-only={sorted(set(srows) - set(drows))[:3]} "
        f"duck-only={sorted(set(drows) - set(srows))[:3]}")
