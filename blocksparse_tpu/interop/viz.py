"""Sparsity visualization: terminal spy plots.

Parity target: the UnicodePlots weak-dependency extension
(ext/BlockUnicodePlots/BlockUnicodePlots.jl:8-38), which overloads
``Base.show`` to draw a ``spy`` plot titled
``"<map summary> with <nnz> non-zero entries"``.  Here ``spy`` renders a
pure-Python density grid (no plotting dependency needed) and ``show`` prints
the summary + plot for every format and its lazy wrappers.
"""

from __future__ import annotations

import numpy as np

from .scipy_io import rowcolvals

__all__ = ["spy", "show", "blocksummary"]

_DENSITY = " .:-=+*#%@"


def blocksummary(A) -> str:
    """Parity: ``blocksummary`` (BlockUnicodePlots.jl:18-38)."""
    m, n = A.shape
    nnz = getattr(A, "nnz", None)
    if nnz is None and hasattr(A, "op"):
        nnz = getattr(A.op, "nnz", None)
    name = type(A).__name__
    base = f"{m}x{n} {name}"
    if nnz is not None:
        base += f" with {nnz} non-zero entries"
    return base


def spy(A, width: int = 64, height: int = 24) -> str:
    """Render the sparsity pattern as a character density grid."""
    m, n = A.shape
    r, c, v = rowcolvals(A)
    grid = np.zeros((height, width), dtype=np.float64)
    if r.size:
        gi = np.clip((np.asarray(r) * height) // max(m, 1), 0, height - 1).astype(int)
        gj = np.clip((np.asarray(c) * width) // max(n, 1), 0, width - 1).astype(int)
        np.add.at(grid, (gi, gj), np.abs(np.asarray(v)))
    mx = grid.max()
    if mx > 0:
        grid = grid / mx
    lines = []
    border = "+" + "-" * width + "+"
    lines.append(border)
    for i in range(height):
        row = "".join(
            _DENSITY[min(int(cell * (len(_DENSITY) - 1) + (0 if cell == 0 else 1)),
                         len(_DENSITY) - 1)]
            for cell in grid[i]
        )
        lines.append("|" + row + "|")
    lines.append(border)
    return "\n".join(lines)


def show(A, **kwargs) -> str:
    """Summary + spy plot (parity: Base.show overload, BlockUnicodePlots.jl:8-16)."""
    out = blocksummary(A) + "\n" + spy(A, **kwargs)
    print(out)
    return out
