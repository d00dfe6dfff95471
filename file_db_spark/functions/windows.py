"""Window helpers for ALREADY-BOUNDED inputs.

``WindowExec: No Partition Defined`` is Spark's corpus-scale alarm: an
empty partition spec moves ALL rows to one task. The call sites below
use a window over a result that is already bounded to K rows — a
TakeOrderedAndProject top-K (d12 vocab, d22 CMS candidates, d24 BPE
pairs, s9 heavy hitters) or a grouped report table (d11 mix shares) —
where one task IS the intended plan. Left as a bare ``Window.orderBy``
they flood every bench/driver log with warnings indistinguishable from
a real scale bug (the r02 verdict's d12 finding). These helpers
partition by a constant-VALUED expression derived from a real column
(``substring(col, 0, 0)`` = '' for every row): a bare literal would be
constant-folded straight back out of the window spec by Catalyst's
FoldablePropagation (verified on 4.1), but a column-anchored expression
survives, keeping the identical single-task execution and ordering
semantics while keeping logs clean — so a genuinely unbounded global
window can't hide in the noise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def _const_key(anchor: Column | str) -> Column:
    c = F.col(anchor) if isinstance(anchor, str) else anchor
    return F.substring(c.cast("string"), 0, 0)


def bounded_rank_window(anchor: Column | str, *order: Column | str) -> WindowSpec:
    """Ordering window over a K-row-bounded input (rank assignment).

    ``anchor`` is any column of the frame; it only roots the
    constant-valued partition key."""
    return Window.partitionBy(_const_key(anchor)).orderBy(*order)


def bounded_frame_window(anchor: Column | str) -> WindowSpec:
    """Whole-frame window over a small aggregated table (global share)."""
    return Window.partitionBy(_const_key(anchor))
