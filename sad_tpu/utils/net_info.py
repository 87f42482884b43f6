"""Model introspection: parameter summaries and compiled-program dumps.

The analogue of the reference's first-iter net printout
(lib/utils/net.py:224-263 print_net) and pbtxt dumps
(tools/train_net.py:306-312): a param-tree summary table and optional
HLO text of a jitted function (the XLA 'graph IR' replacing NetDef).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def print_model_summary(params: Any, max_rows: int = 0) -> str:
    """Human-readable table: path, shape, #params, dtype. Returns the text
    (also printed)."""
    rows = []
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        rows.append((name, tuple(leaf.shape), n, str(leaf.dtype)))
    lines = [f"{'param':<60} {'shape':<22} {'count':>12} dtype"]
    shown = rows if not max_rows else rows[:max_rows]
    for name, shape, n, dt in shown:
        lines.append(f"{name:<60} {str(shape):<22} {n:>12,} {dt}")
    if max_rows and len(rows) > max_rows:
        lines.append(f"... ({len(rows) - max_rows} more)")
    lines.append(f"TOTAL: {total:,} params ({total * 4 / 1e6:.1f} MB fp32)")
    text = "\n".join(lines)
    print(text)
    return text


def dump_hlo(fn, *example_args, path: Optional[str] = None) -> str:
    """Lowered stablehlo text of a jittable function — the NetDef-pbtxt
    analogue (train_net.py:306-312 dumped net protos)."""
    lowered = jax.jit(fn).lower(*example_args)
    txt = lowered.as_text()
    if path:
        with open(path, "w") as f:
            f.write(txt)
    return txt
