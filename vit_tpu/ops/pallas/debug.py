"""In-kernel debugging helpers.

TPU-native equivalent of reference vit/kernels/utils.py:5-29
(``test_pid_conds``/``print_if``: condition-string-gated printing from
inside kernels for specific program ids, e.g. ``'=0,>1'`` meaning
"grid axis 0 == 0 AND grid axis 1 > 1"). Built on ``pl.debug_print`` +
``pl.when``, which work in both compiled and interpreter modes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl

_OPS = {
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
    "!=": lambda a, b: a != b,
}


def pid_conds(conds: str):
    """Parse ``'=0,>1,<5'`` into a traced boolean over the current program ids.

    The i-th comma-separated condition applies to grid axis i; empty entries
    (``'=0,,>2'``) are always true. Mirrors reference vit/kernels/utils.py:5-24.
    """
    ok = jnp.bool_(True)
    for axis, cond in enumerate(conds.split(",")):
        cond = cond.strip()
        if not cond:
            continue
        op = cond[:2] if cond[:2] in _OPS else cond[:1]
        rhs = int(cond[len(op):])
        ok = jnp.logical_and(ok, _OPS[op](pl.program_id(axis), rhs))
    return ok


def print_if(fmt: str, *args, conds: str = "=0"):
    """``pl.debug_print`` only for programs matching ``conds``.

    Usage inside a kernel::

        print_if("acc[0,0] = {}", acc_ref[0, 0], conds="=0,=0")

    Mirrors reference vit/kernels/utils.py:27-29.
    """
    @pl.when(pid_conds(conds))
    def _():
        pl.debug_print(fmt, *args)
