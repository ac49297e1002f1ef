"""Row-count tolerance invariant (reference C9).

After a load that deletes rows, the new row count must satisfy
``new_count >= ceil(old_count * tolerance)`` — two tiers, warning and error;
the error tier aborts (rolls back) the load
(/root/reference/sql/02-bde_control_functions.sql.in:2006-2083; config
``row_tol=<error>,<warning>`` conf/tables.conf:41-46; e2e behavior
t/linz_bde_uploader.t:1309-1359).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


class RowToleranceError(RuntimeError):
    """Error-tier violation — the load must be rolled back."""


@dataclass
class ToleranceResult:
    old_count: int
    new_count: int
    warning_threshold: int
    error_threshold: int
    level: str  # 'ok' | 'warning' | 'error'

    @property
    def ok(self) -> bool:
        return self.level == "ok"


def check_row_tolerance(
    old_count: int,
    new_count: int,
    tol_error: float | None = None,
    tol_warning: float | None = None,
    raise_on_error: bool = True,
) -> ToleranceResult:
    """Evaluate both tiers. Tolerances are ratios in [0,1]; ``None`` disables
    a tier. ``ceil(count*tol)::bigint`` per the reference (:2064,2073)."""
    err_thr = int(math.ceil(old_count * tol_error)) if tol_error is not None else 0
    warn_thr = int(math.ceil(old_count * tol_warning)) if tol_warning is not None else 0
    if tol_error is not None and new_count < err_thr:
        level = "error"
    elif tol_warning is not None and new_count < warn_thr:
        level = "warning"
    else:
        level = "ok"
    res = ToleranceResult(old_count, new_count, warn_thr, err_thr, level)
    if level == "error" and raise_on_error:
        raise RowToleranceError(
            f"row count {new_count} below error tolerance {err_thr} "
            f"(= ceil({old_count} * {tol_error}))"
        )
    return res
