"""Python UDTF surface (SURVEY §2.10).

The reference has no user-extensible function surface; the engine
exposes Spark 4's Python UDTF as the table-function extension point.
``ExplodeProps`` is the demonstrator: explode the dynamic ``props``
JSON payload (the reference's per-type extra event fields, SURVEY
§1.2 "props JSON string column") into (key, value) rows.

Slow-path warning, by design: a Python UDTF is row-at-a-time Python
(Arrow-batched here with ``useArrow``), ~10-100× slower than the
JVM-side equivalent ``explode(from_json(props, 'map<string,string>'))``
— which is what the engine's own queries use (q_map_funcs,
q_json_extract). Reach for a UDTF only when the row-expansion logic
genuinely can't be expressed with built-ins (custom parsers, stateful
per-row expansion, external-library tokenizers).
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="key string, value string", useArrow=True)
class ExplodeProps:
    """props JSON object → one (key, stringified value) row per field."""

    def eval(self, props: str):  # noqa: D102 - UDTF contract
        if not props:
            return
        try:
            obj = json.loads(props)
        except ValueError:
            return
        if isinstance(obj, dict):
            for k, v in obj.items():
                # JSON-faithful stringification: bools as true/false,
                # nested values as compact JSON (Python str() would
                # emit True / single-quoted dicts, diverging from the
                # documented from_json/json_extract_string parity)
                if v is None:
                    yield k, None
                elif isinstance(v, str):
                    yield k, v
                else:
                    yield k, json.dumps(v, separators=(",", ":"))


def register_udtfs(spark) -> None:
    """Register the UDTF surface for spark.sql LATERAL usage."""
    spark.udtf.register("explode_props", ExplodeProps)


# ----------------------------------------------------------------------
# Grouped-agg pandas_udf (the vectorized UDAF flavor of §2.10)
# ----------------------------------------------------------------------
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pyspark.sql.functions import pandas_udf  # noqa: E402


@pandas_udf("double")
def gmean_udaf(prices: pd.Series) -> float:
    """Series→scalar UDAF: geometric mean via an Arrow-batched numpy
    reduction, over the POSITIVE domain only — ln(x) is undefined at
    x <= 0 (pandas would emit -inf/nan where DuckDB's ln() raises, a
    divergence the nasty-table fuzz caught), so both the UDAF and its
    declarative oracle restrict to x > 0 explicitly. Empty positive
    subset → NaN, matching exp(avg(ln)) over zero rows (NULL)."""
    x = prices.astype("float64")
    x = x[x > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x).mean()))
