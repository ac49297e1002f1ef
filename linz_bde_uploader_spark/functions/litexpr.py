"""One-call literal Column builders (r16 optimization, guide §5).

Building a literal vector as ``F.array(*[F.lit(x) for x in vec])``
costs one py4j round trip PER ELEMENT (~150 ms for a 64-dim vector,
measured); a benchmark table or PQ codebook embeds thousands of such
literals and its query then spends seconds of pure DRIVER time
constructing the plan. Rendering the identical literal tree as ONE
Spark SQL string and parsing it with a single ``F.expr`` call is
~60x faster (0.06 s for 25 x 64 doubles vs 4.1 s measured) and
produces the same Catalyst ``Literal`` nodes.

Bit-exactness: doubles are rendered as ``repr(v)`` + the ``D``
double-literal suffix, which Spark parses with Java's
``Double.parseDouble`` — correctly rounded, and ``repr`` round-trips,
so the parsed double is bit-identical to the Python value (pinned by
``tests/test_opt_r16.py``). Non-finite values fall back to explicit
casts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_double(v: float) -> str:
    """A Spark SQL literal that parses to exactly the double ``v``."""
    r = repr(float(v))
    if r == "nan":
        return "CAST('NaN' AS DOUBLE)"
    if r == "inf":
        return "CAST('Infinity' AS DOUBLE)"
    if r == "-inf":
        return "CAST('-Infinity' AS DOUBLE)"
    return r + "D"


def lit_double_array(vals) -> Column:
    """``array<double>`` literal via one ``F.expr`` call."""
    vals = list(vals)
    if not vals:
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr("array(" + ", ".join(sql_double(v) for v in vals) + ")")


def sql_double_array(vals) -> str:
    """The SQL text of an ``array<double>`` literal (for embedding in
    a larger rendered expression)."""
    vals = list(vals)
    if not vals:
        return "CAST(array() AS ARRAY<DOUBLE>)"
    return "array(" + ", ".join(sql_double(v) for v in vals) + ")"


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal via one ``F.expr`` call."""
    rows = [list(r) for r in rows]
    if not rows:
        return F.expr("CAST(array() AS ARRAY<ARRAY<DOUBLE>>)")
    return F.expr(
        "array(" + ", ".join(sql_double_array(r) for r in rows) + ")"
    )
