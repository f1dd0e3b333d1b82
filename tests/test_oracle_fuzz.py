"""Cross-engine contract beyond the driver corpus: every
documents-only oracled query must agree with its DuckDB oracle on a
NASTY corpus — unicode whitespace, CJK, emoji, empty/whitespace-only
docs, single tokens, exact dups. The driver's tables are ASCII, so
this is where engine-specific trim/tokenize/ord semantics would
diverge silently (the \\xa0 tokenizer bug class, fixed in r4, stays
fixed here).
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from selfcheck import compare  # noqa: E402  (tools/selfcheck.py)

from vsphere_event_streaming_spark.registry import load_all  # noqa: E402
from vsphere_event_streaming_spark.tables import TABLES  # noqa: E402

NASTY = [
    (0, "", "en", "src0"),
    (1, "   \t\n", "de", "src1"),
    (2, "\xa0leading nbsp token", "en", "src0"),
    (3, "tab\tseparated\tritual words", "fr", "src2"),
    (4, "的是了 在我 mixed cjk words", "zh", "src0"),
    (5, "emoji 🎉 and ünïcode wörds", "es", "src3"),
    (6, "the the the the repetition test", "en", "src1"),
    (7, "solo", "en", "src0"),
    (8, "x" * 600, "de", "src2"),
    (9, "normal words appear here rather often", "en", "src0"),
    (10, "normal words appear here rather often", "en", "src1"),
    (11, "normal words appear here rather часто", "en", "src0"),
    # markup/URL rows: the q_markup_strip / q_url_domains branches the
    # (markup-free) driver corpus never exercises
    (12, "<p>Hello &amp;lt; <b>world</b>&nbsp;&#39;x&#39;</p>", "en", "src0"),
    (13, "see https://Example.COM/path?q=1 or http://a.b.c done", "en", "src1"),
    (14, "&amp; alone <!-- note --> <DIV CLASS=\"x\">y</DIV> tail", "de", "src2"),
    (15, "broken <tag no close &quot;quoted&quot; http://host", "fr", "src3"),
    (16, "HTTP://UP.CASE ftp://no https:/half https://ok.io/p", "en", "src0"),
]


def _documents_only_queries():
    """Oracled queries whose SQL reads only the documents table."""
    others = [t for t in TABLES if t != "documents"]
    out = []
    for name, qd in load_all().items():
        if qd.oracle is None or "documents" not in qd.oracle:
            continue
        if any(t in qd.oracle for t in others):
            continue
        out.append(name)
    return out


def _random_docs(seed: int = 13, n: int = 200):
    """Seeded word-soup over mixed scripts and odd whitespace: the
    systematic companion to the handcrafted NASTY rows."""
    import random

    r = random.Random(seed)
    vocab = (
        [f"w{i}" for i in range(40)]
        + ["的", "是", "在", "wörter", "niño", "🎉", "x" * 50, "a"]
        + ["\xa0glued", "mid\xa0nbsp"]
        + ["<b>", "</b>", "<em>x</em>", "&amp;", "&lt;", "&nbsp;",
           "https://ex.com/p", "http://A.B/q?x=1", "<br/>"]
    )
    seps = [" ", "  ", "\t", "\n", " \x0b ", "\f"]
    langs = ["en", "de", "es", "fr", "zh"]
    rows = []
    for i in range(n):
        k = r.randint(0, 30)
        text = "".join(
            w + r.choice(seps)
            for w in (r.choice(vocab) for _ in range(k))
        )
        rows.append(
            (i, text, r.choice(langs), f"src{r.randint(0, 5)}", len(text))
        )
    return rows


@pytest.fixture(scope="module", params=["handcrafted", "random"])
def nasty_dir(spark, tmp_path_factory, request):
    d = tmp_path_factory.mktemp(f"nasty_{request.param}")
    rows = (
        [(i, t, lg, s, len(t)) for i, t, lg, s in NASTY]
        if request.param == "handcrafted"
        else _random_docs()
    )
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_documents_only_oracles_agree_on_nasty_corpus(spark, nasty_dir):
    qs = load_all()
    names = _documents_only_queries()
    assert len(names) >= 20, names  # the fuzz must cover the text tier
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{nasty_dir}/documents.parquet/*.parquet'"
    )
    failures = []
    for name in sorted(names):
        try:
            df = qs[name].fn(spark, nasty_dir)
            cols = sorted(df.columns)
            spark_rows = [[r[c] for c in cols] for r in df.collect()]
            res = con.sql(qs[name].oracle)
            idx = [list(res.columns).index(c) for c in cols]
            duck_rows = [[r[i] for i in idx] for r in res.fetchall()]
            err = compare(spark_rows, duck_rows, cols, abs_tol=1.01e-6)
            if err:
                failures.append((name, err))
        except Exception as e:  # pragma: no cover - diagnostic path
            failures.append((name, f"EXCEPTION {type(e).__name__}: {e}"))
    assert not failures, failures


NASTY_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (0, "2024-01-01 00:00:00.000001", 1, "click", 1.5, '{"k": 1}'),
    (1, "2024-01-01 00:00:00.000001", None, "click", None, '{"k": null}'),
    (2, "1970-01-01 00:00:00", 2, "", 0.0, "{}"),
    (3, "2038-01-19 03:14:07", 3, "purchase", -1.25, '{"nested": {"a": [1, 2]}}'),
    (4, "2024-06-01 12:00:00", 4, "signup", 1e15, '{"k": "uni 🎉 wörds"}'),
    (5, "2024-06-01 12:00:00.999999", 4, "error", 1e-15, '{"s": "with \\"quotes\\""}'),
    (6, "2024-06-01 12:00:01", 5, "click", float("inf"), '{"k": 9223372036854775807}'),
    (7, "2024-06-02 00:00:00", None, "purchase", 2.0, None),
    (8, "2024-06-03 00:00:00", 6, "view", 3.0, '{"empty": ""}'),
    (9, "2024-06-04 00:00:00", 7, "click", 4.0, '{"k": 0.5}'),
    # NULL ts with a real user_id: the funnel/retention spine must
    # still emit a depth-0 / no-activity row for user 8 (ADVICE_r10:
    # the fu spine filters only on user_id, not ts).
    (10, None, 8, "view", 5.0, '{"k": 2}'),
    # NULL event_type with real ts/user (r11): the paths query must
    # exclude it on BOTH sides (engine concat_ws skips nulls, oracle
    # || nulls the path — asymmetric unless filtered); the other
    # event oracles must agree on NULL-type grouping/joining.
    (11, "2024-06-05 00:00:00", 9, None, 6.0, '{"k": 3}'),
]


@pytest.fixture(scope="module")
def nasty_events_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("nasty_ev")
    df = spark.createDataFrame(
        NASTY_EVENTS,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    return str(d)


def _events_only_queries():
    others = [t for t in TABLES if t != "events"]
    out = []
    for name, qd in load_all().items():
        if qd.oracle is None or "events" not in qd.oracle:
            continue
        if any(t in qd.oracle for t in others):
            continue
        out.append(name)
    return out


def test_events_only_oracles_agree_on_nasty_corpus(spark, nasty_events_dir):
    """NULL user_id/props/value, epoch-0 and 2038 timestamps, inf,
    unicode and nested JSON: the log/reference tier's oracles must
    agree with the engine on all of it."""
    qs = load_all()
    names = _events_only_queries()
    assert len(names) >= 15, names
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{nasty_events_dir}/events.parquet/*.parquet'"
    )
    failures = []
    for name in sorted(names):
        try:
            df = qs[name].fn(spark, nasty_events_dir)
            cols = sorted(df.columns)
            spark_rows = [[r[c] for c in cols] for r in df.collect()]
            res = con.sql(qs[name].oracle)
            idx = [list(res.columns).index(c) for c in cols]
            duck_rows = [[r[i] for i in idx] for r in res.fetchall()]
            err = compare(spark_rows, duck_rows, cols, abs_tol=1.01e-6)
            if err:
                failures.append((name, err))
        except Exception as e:  # pragma: no cover - diagnostic path
            failures.append((name, f"EXCEPTION {type(e).__name__}: {e}"))
    assert not failures, failures


NASTY_EMBEDDINGS = [
    # (vec_id, embedding[8], label)
    (0, [1.0, 0.5, -0.25, 0.75, 0.1, -0.9, 0.3, 0.2], 0),
    (1, [1.0, 0.5, -0.25, 0.75, 0.1, -0.9, 0.3, 0.2], 1),  # exact dup
    (2, [0.0] * 8, 0),                                      # zero vector
    (3, [-1.0, -0.5, 0.25, -0.75, -0.1, 0.9, -0.3, -0.2], 2),  # negation
    (4, [1e-30] * 8, 0),                                    # denormal-ish
    (5, [1e30, -1e30, 1e30, -1e30, 1e30, -1e30, 1e30, -1e30], 1),
    (6, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8], 2),
]


@pytest.fixture(scope="module")
def nasty_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty_emb")
    df = spark.createDataFrame(
        NASTY_EMBEDDINGS,
        "vec_id long, embedding array<float>, label int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


def _embeddings_only_queries():
    others = [t for t in TABLES if t != "embeddings"]
    out = []
    for name, qd in load_all().items():
        if qd.oracle is None or "embeddings" not in qd.oracle:
            continue
        if any(t in qd.oracle for t in others):
            continue
        out.append(name)
    return out


def test_embeddings_only_oracles_agree_on_nasty_corpus(spark, nasty_emb_dir):
    """Zero vectors (cosine 0/0 -> NaN), exact dups, negations, 1e30
    magnitudes: the vector tier's oracles must agree with the engine
    on degenerate inputs too (compare() treats NaN == NaN)."""
    qs = load_all()
    names = _embeddings_only_queries()
    assert len(names) >= 5, names
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{nasty_emb_dir}/embeddings.parquet/*.parquet'"
    )
    failures = []
    for name in sorted(names):
        try:
            df = qs[name].fn(spark, nasty_emb_dir)
            cols = sorted(df.columns)
            spark_rows = [[r[c] for c in cols] for r in df.collect()]
            res = con.sql(qs[name].oracle)
            idx = [list(res.columns).index(c) for c in cols]
            duck_rows = [[r[i] for i in idx] for r in res.fetchall()]
            err = compare(spark_rows, duck_rows, cols, abs_tol=1.01e-6)
            if err:
                failures.append((name, err))
        except Exception as e:  # pragma: no cover - diagnostic path
            failures.append((name, f"EXCEPTION {type(e).__name__}: {e}"))
    assert not failures, failures


NASTY_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    #  o_orderpriority) — ties, NULL keys, orphan customers, epoch dates
    (100, 1, "O", 10.0, "2024-01-01 00:00:00.000001", "1-URGENT"),
    (101, 1, "F", 20.0, "2024-01-01 00:00:00.000001", "2-HIGH"),   # exact tie
    (102, None, "O", 30.0, "2024-02-01 00:00:00", "3-MEDIUM"),     # NULL cust
    (103, 99, "P", 40.0, "1970-01-01 00:00:00", "4-NOT SPECIFIED"),  # orphan
    (104, 4, "O", 50.0, "2024-06-01 12:00:00", "5-LOW"),           # == event ts
    (105, 4, "F", 60.0, "2024-06-01 12:00:00", "5-LOW"),           # same-ts tie
    (106, 5, "O", 70.0, "2038-01-19 03:14:07", "1-URGENT"),
]


@pytest.fixture(scope="module")
def nasty_join_dir(spark, nasty_events_dir, tmp_path_factory):
    import shutil

    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("nasty_join")
    shutil.copytree(
        f"{nasty_events_dir}/events.parquet", str(d / "events.parquet")
    )
    df = spark.createDataFrame(
        NASTY_ORDERS,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "orders.parquet")
    )
    return str(d)


def test_join_tier_oracles_agree_on_nasty_fixtures(spark, nasty_join_dir):
    """As-of joins and cogroup reconciliation over NULL join keys,
    exact-timestamp ties (tiebreaker must fire identically), orphan
    customers, and epoch/2038 dates."""
    qs = load_all()
    others = [t for t in TABLES if t not in ("events", "orders")]
    names = [
        n
        for n, qd in qs.items()
        if qd.oracle
        and "events" in qd.oracle
        and "orders" in qd.oracle
        and not any(t in qd.oracle for t in others)
    ]
    assert len(names) >= 3, names
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{nasty_join_dir}/{t}.parquet/*.parquet'"
        )
    failures = []
    for name in sorted(names):
        try:
            df = qs[name].fn(spark, nasty_join_dir)
            cols = sorted(df.columns)
            spark_rows = [[r[c] for c in cols] for r in df.collect()]
            res = con.sql(qs[name].oracle)
            idx = [list(res.columns).index(c) for c in cols]
            duck_rows = [[r[i] for i in idx] for r in res.fetchall()]
            err = compare(spark_rows, duck_rows, cols, abs_tol=1.01e-6)
            if err:
                failures.append((name, err))
        except Exception as e:  # pragma: no cover - diagnostic path
            failures.append((name, f"EXCEPTION {type(e).__name__}: {e}"))
    assert not failures, failures


def test_compare_pairing_survives_round_boundary_reorder():
    """The row-pairing regression from review: a 6th-decimal flip at a
    round-half boundary must not reorder a row past a neighbor and
    pair unrelated rows — non-float fields anchor the sort."""
    cols = ["score", "name"]
    spark_rows = [[1.000001, "zzz"], [1.000001, "aaa"]]
    duck_rows = [[1.000000, "zzz"], [1.000001, "aaa"]]  # zzz 1 step low
    # old repr-of-rounded sort paired (1.000000,'zzz') with
    # (1.000001,'aaa') and failed on the string column; the
    # non-float-first key pairs by name, so the float tolerance applies
    assert compare(spark_rows, duck_rows, cols, abs_tol=1.01e-6) is None
    # and genuinely different values still fail
    assert compare(
        [[1.5, "zzz"]], [[1.0, "zzz"]], cols, abs_tol=1.01e-6
    ) is not None


# ----------------------------------------------------------------------
# relational-family fuzz: nasty star-schema tables
# ----------------------------------------------------------------------
# The documents/events fuzzes above cover single-table oracles; the
# join/aggregate/TPC-H families had only driver-corpus evidence. These
# tables plant the adversarial shapes join semantics must agree on:
# NULL join keys (never match, even NULL=NULL), dangling foreign keys,
# DUPLICATE keys (multiplicity), negative/extreme numerics, epoch-0 /
# 2038 timestamps, ties on every ordering column, unicode names.

def _nasty_tables(spark):
    from pyspark.sql import functions as F

    customer = spark.createDataFrame(
        [
            (1, "alice", 0, 100.5, "BUILDING"),
            (2, "böb 🎉", 1, -999.25, "AUTOMOBILE"),
            (3, "carol", None, 0.0, "BUILDING"),      # NULL nationkey
            (4, "dave", 99, 1e15, "MACHINERY"),        # dangling nation
            (5, "eve", 0, 100.5, "BUILDING"),          # value ties with 1
            (5, "eve-dup", 0, 7.0, "FURNITURE"),       # DUPLICATE custkey
            (6, "frank", 1, None, "HOUSEHOLD"),        # NULL acctbal
        ],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [
            (10, 1, "O", 500.0, "2024-01-01 00:00:00", "1-URGENT"),
            (11, 1, "F", 500.0, "2024-01-01 00:00:00", "2-HIGH"),
            (12, 2, "O", -50.0, "1970-01-01 00:00:00", "3-MEDIUM"),
            (13, None, "F", 10.0, "2038-01-19 03:14:07", "4-NOT SPEC"),
            (14, 77, "O", 1e9, "2024-06-01 12:00:00", "5-LOW"),  # dangling
            (15, 5, "P", 0.0, "2024-06-01 12:00:00", "1-URGENT"),
            (15, 5, "P", 0.0, "2024-06-01 12:00:00", "1-URGENT"),  # dup row
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    lineitem = spark.createDataFrame(
        [
            (10, 100, 1, 1, 5.0, 1000.0, 0.0, 0.08, "N", "O",
             "2024-01-05 00:00:00"),
            (10, 100, 1, 2, 5.0, 1000.0, 1.0, 0.0, "R", "F",
             "2024-01-05 00:00:00"),                  # discount 100%
            (11, 101, 2, 1, 0.0, 0.0, 0.5, 0.5, "A", "F",
             "1970-01-01 00:00:00"),                  # zero qty/price
            (12, None, None, 1, -3.0, -10.0, 0.1, 0.1, "N", "O",
             "2038-01-19 03:14:07"),                  # NULL part/supp keys
            (99, 999, 9, 1, 1.0, 1.0, 0.2, 0.2, "R", "F",
             "2024-06-01 12:00:00"),                  # dangling orderkey
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    part = spark.createDataFrame(
        [
            (100, "green thing", "Brand#1", "SMALL PLATED", 5, 10.0),
            (101, "ünïcode 的 part", "Brand#2", "LARGE BRUSHED", None, 0.0),
            (102, "orphan", "Brand#1", "MEDIUM", -1, -5.0),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    supplier = spark.createDataFrame(
        [(1, "sup-a", 0, 1.0), (2, "sup-b", None, -2.0), (9, "sup-z", 99, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(0, "ALAND", 0), (1, "BRAZIL", 1), (2, "orphan-region", 9)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame(
        [(0, "AMERICA"), (1, "ASIA")],
        "r_regionkey int, r_name string",
    )
    events = spark.createDataFrame(
        NASTY_EVENTS,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    return {
        "customer": customer,
        "orders": orders,
        "lineitem": lineitem,
        "part": part,
        "supplier": supplier,
        "nation": nation,
        "region": region,
        "events": events,
    }


def _relational_queries(tables: set[str]) -> list[str]:
    """Oracled queries whose SQL references ONLY the given tables."""
    import re

    out = []
    for name, qd in load_all().items():
        if qd.oracle is None:
            continue
        used = {
            t for t in TABLES if re.search(rf"\b{t}\b", qd.oracle)
        }
        if used and used <= tables:
            out.append(name)
    return out


#: Relational oracles excluded from the nasty-table fuzz, each with
#: the reason (a float/infinity representation difference, not a join
#: semantics bug — every exclusion must state why or it rots).
RELATIONAL_FUZZ_EXCLUDED: dict[str, str] = {}


def test_relational_oracles_agree_on_nasty_tables(spark, tmp_path):
    import duckdb as _duckdb

    d = str(tmp_path)
    for name, df in _nasty_tables(spark).items():
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{d}/{name}.parquet"
        )
    provided = set(_nasty_tables(spark))
    names = [
        n
        for n in _relational_queries(provided)
        if n not in RELATIONAL_FUZZ_EXCLUDED
    ]
    assert len(names) >= 40, names  # must cover the relational surface
    con = _duckdb.connect()
    for t in provided:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{d}/{t}.parquet/*.parquet'"
        )
    qs = load_all()
    failures = []
    for name in sorted(names):
        try:
            df = qs[name].fn(spark, d)
            cols = sorted(df.columns)
            spark_rows = [[r[c] for c in cols] for r in df.collect()]
            res = con.sql(qs[name].oracle)
            idx = [list(res.columns).index(c) for c in cols]
            duck_rows = [[r[i] for i in idx] for r in res.fetchall()]
            err = compare(spark_rows, duck_rows, cols, abs_tol=1.01e-6)
            if err:
                failures.append((name, err))
        except Exception as e:  # pragma: no cover - diagnostic path
            failures.append((name, f"EXCEPTION {type(e).__name__}: {e}"))
    assert not failures, failures


# ----------------------------------------------------------------------
# vector-family fuzz: nasty embeddings
# ----------------------------------------------------------------------
#: Adversarial vectors: exact duplicates (cosine 1), near-parallel
#: pairs, antiparallel (cosine -1), magnitude extremes (1e12 / 1e-12 —
#: norms at double-arithmetic edges), negative values, a constant
#: vector, NULL labels, and ZERO vectors both as a candidate and as
#: the min-id query vector — cosine is undefined there, but both
#: engines propagate the 0/0 identically through every filter,
#: rounding, and top-k in all 10 queries (probed per-query before
#: promotion), so the degenerate row is covered, not excluded.
def _nasty_embeddings():
    import random

    r = random.Random(7)
    dim = 8
    rows = []

    def v(seed_vals):
        return [float(x) for x in seed_vals]

    base = [r.uniform(-1, 1) for _ in range(dim)]
    rows.append((0, v(base), 0))
    rows.append((1, v(base), 0))                       # exact duplicate
    rows.append((2, v([x + 1e-6 for x in base]), 1))   # near-parallel
    rows.append((3, v([-x for x in base]), 1))         # antiparallel
    rows.append((4, v([x * 1e12 for x in base]), 2))   # huge magnitude
    rows.append((5, v([x * 1e-12 for x in base]), 2))  # tiny magnitude
    rows.append((6, v([1.0] * dim), None))             # constant, NULL label
    rows.append((7, v([-1.0] * dim), 3))
    for i in range(8, 40):
        rows.append(
            (i, v([r.uniform(-5, 5) for _ in range(dim)]), i % 4)
        )
    rows.append((-1, v([0.0] * dim), 0))  # zero vector AS the query
    rows.append((100, v([0.0] * dim), 2))  # zero vector as candidate
    return rows


def _embeddings_only_queries():
    import re

    others = [t for t in TABLES if t != "embeddings"]
    out = []
    for name, qd in load_all().items():
        if qd.oracle is None or "embeddings" not in qd.oracle:
            continue
        if any(re.search(rf"\b{t}\b", qd.oracle) for t in others):
            continue
        out.append(name)
    return out


def test_embeddings_only_oracles_agree_on_nasty_vectors(spark, tmp_path):
    import duckdb as _duckdb

    d = str(tmp_path)
    spark.createDataFrame(
        _nasty_embeddings(),
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    names = _embeddings_only_queries()
    assert len(names) >= 8, names  # must cover the vector tier
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{d}/embeddings.parquet/*.parquet'"
    )
    qs = load_all()
    failures = []
    for name in sorted(names):
        try:
            df = qs[name].fn(spark, d)
            cols = sorted(df.columns)
            spark_rows = [[r[c] for c in cols] for r in df.collect()]
            res = con.sql(qs[name].oracle)
            idx = [list(res.columns).index(c) for c in cols]
            duck_rows = [[r[i] for i in idx] for r in res.fetchall()]
            err = compare(spark_rows, duck_rows, cols, abs_tol=1.01e-6)
            if err:
                failures.append((name, err))
        except Exception as e:  # pragma: no cover - diagnostic path
            failures.append((name, f"EXCEPTION {type(e).__name__}: {e}"))
    assert not failures, failures


#: The media near-dup pairing queries (VERDICT_r6 #8) — named here so
#: the parametrization below makes their fuzz coverage visible in the
#: test IDs, on top of their automatic membership in the
#: documents-only family (asserted next).
MEDIA_PAIRING = (
    "q_dedup_media",
    "q_dedup_audio",
    "q_dedup_video",
    "q_dedup_media_robust",
)


def test_media_pairing_queries_are_in_the_fuzz_family():
    """The generic nasty-documents fuzz (empty/CJK/markup docs — the
    zero-fingerprint class) must auto-discover every media pairing
    query; a refactor that moves one off the documents-only oracle
    shape loses that coverage silently without this pin."""
    names = _documents_only_queries()
    missing = [n for n in MEDIA_PAIRING if n not in names]
    assert not missing, missing


@pytest.fixture(scope="module")
def poisoned_dir(spark, tmp_path_factory):
    """Degenerate-class corpus: 120 byte-identical docs (one pHash /
    audio-fp / frame-hash value repeated 120×, far above
    MEDIA_ROBUST_FP_CAP), 8 empty-ish docs (the zero-fingerprint
    class), and a handful of distinct near-dup texts — the skew
    scenario max_fp_freq exists for, at a size the all-pairs oracle
    can still verify exactly."""
    d = tmp_path_factory.mktemp("poisoned")
    rows = [(i, "same exact content every time", "en", "src0") for i in range(120)]
    rows += [(200 + i, "", "en", "src1") for i in range(4)]
    rows += [(210 + i, " \t ", "de", "src1") for i in range(4)]
    rows += [
        (300, "a slightly different document body", "en", "src2"),
        (301, "a slightly different document bodY", "en", "src2"),
        (302, "wholly unrelated words in this one", "fr", "src3"),
    ]
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


@pytest.mark.parametrize("name", MEDIA_PAIRING)
def test_media_pairing_on_poisoned_degenerate_corpus(
    spark, poisoned_dir, name
):
    """Each media pairing query vs its all-pairs oracle on the
    poisoned corpus: the 120-dup group floods the banded join's
    buckets (and, for q_dedup_media_robust, exercises the exact star
    tier at real degenerate scale) while the empty docs walk the
    zero-fingerprint path through the real codecs."""
    qs = load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{poisoned_dir}/documents.parquet/*.parquet'"
    )
    df = qs[name].fn(spark, poisoned_dir)
    cols = sorted(df.columns)
    spark_rows = [[r[c] for c in cols] for r in df.collect()]
    res = con.sql(qs[name].oracle)
    idx = [list(res.columns).index(c) for c in cols]
    duck_rows = [[r[i] for i in idx] for r in res.fetchall()]
    err = compare(spark_rows, duck_rows, cols, abs_tol=1.01e-6)
    assert err is None, err
    if name == "q_dedup_media_robust":
        # the degenerate group must arrive as a STAR (119 rows at
        # hamming 0 from the 120-dup class), not a 7140-pair clique
        zero = [r for r in spark_rows if r[cols.index("hamming")] == 0]
        assert len(zero) < 1000, len(zero)


def test_cluster_quality_agrees_on_joint_nasty_corpus(spark, tmp_path):
    """q_cluster_quality joins TWO tables (k-means cells over
    embeddings ∘ LM floor over documents), so neither single-table
    fuzz family auto-discovers it (the media-pairing pin precedent).
    Joint corpus: the nasty vectors (zero/antiparallel/1e12 rows —
    winsorization territory) keyed against the nasty word-soup docs,
    with PARTIAL id overlap so the inner doc join and the left LM
    join both exercise their miss paths identically in both
    engines."""
    import duckdb as _duckdb

    d = str(tmp_path)
    spark.createDataFrame(
        _nasty_embeddings(),
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    rows = [(i, t, lg, s, len(t)) for i, t, lg, s in NASTY]
    # ids 0..16 overlap the nasty vec_ids 0..40 partially; -1/100 dangle
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    qs = load_all()
    name = "q_cluster_quality"
    df = qs[name].fn(spark, d)
    cols = sorted(df.columns)
    spark_rows = [[r[c] for c in cols] for r in df.collect()]
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{d}/embeddings.parquet/*.parquet'"
    )
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"
    )
    res = con.sql(qs[name].oracle)
    idx = [list(res.columns).index(c) for c in cols]
    duck_rows = [[r[i] for i in idx] for r in res.fetchall()]
    err = compare(spark_rows, duck_rows, cols, abs_tol=1.01e-6)
    assert err is None, err
    assert spark_rows, "joint fuzz corpus produced no clusters"
