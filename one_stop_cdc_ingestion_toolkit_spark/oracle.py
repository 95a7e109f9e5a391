"""Driver-style result comparison against the DuckDB oracle.

Mirrors the harness contract (/root/repo/__spark_entry__.py docstring):
row count + column-name set + order-insensitive value hash, where columns
are sorted by name and cells normalized (ints widened, temporals → ISO,
Decimals collapsed, floats via repr).
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math


def norm_cell(v: object, side: str = "spark") -> str:
    """Driver-faithful cell rendering (r1 forensics): the driver's compare
    keeps Spark DECIMAL as ``decimal.Decimal`` (scale-preserving str,
    '126074.00') but DuckDB DECIMAL/HUGEINT collapse to float64
    ('126074.0'). Emulating that asymmetry here means a query whose output
    types are ambiguous fails locally exactly as it would at the driver;
    tests/test_output_types.py bans such types outright."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v) if side == "spark" else repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple], side: str = "spark") -> str:
    """Order-insensitive: row strings are sorted before hashing, so a
    query whose ORDER BY is only a partial order cannot flake on
    tie-ordering differences between engines."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(row[i], side) for i in order) for row in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(
    scols: list[str],
    srows: list[tuple],
    dcols: list[str],
    drows: list[tuple],
    max_diffs: int = 3,
) -> list[str]:
    """Return a list of problems (empty = match)."""
    problems: list[str] = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    if problems:
        return problems
    if table_hash(scols, srows, "spark") != table_hash(dcols, drows, "duck"):
        problems.append("value hash mismatch")
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        shown = 0
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            sn = [norm_cell(sr[j], "spark") for j in order_s]
            dn = [norm_cell(dr[j], "duck") for j in order_d]
            if sn != dn:
                problems.append(f"row {i}: spark={sn} duck={dn}")
                shown += 1
                if shown >= max_diffs:
                    break
    return problems
