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


@pytest.fixture(scope="module")
def nasty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty")
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in NASTY],
        ["doc_id", "text", "lang", "source", "n_chars"],
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
            err = compare(spark_rows, duck_rows, cols)
            if err:
                failures.append((name, err))
        except Exception as e:  # pragma: no cover - diagnostic path
            failures.append((name, f"EXCEPTION {type(e).__name__}: {e}"))
    assert not failures, failures
