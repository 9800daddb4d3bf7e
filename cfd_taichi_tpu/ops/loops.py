"""Unrolled `lax.while_loop`: amortize per-iteration control-flow overhead.

Measured on the real chip (tools/perf_probe3.py, 2026-08-17): a
`lax.while_loop` whose body carries five (N,) f32 arrays and does trivial
work costs ~3.05 ms PER ITERATION at N=29k — independent of carry layout
(tuple-of-5 vs packed (5, N)) and far above the HBM cost of the carried
bytes (~0.6 MB). The cost is the loop's control-flow turnaround itself
(each iteration's predicate gates the next body dispatch), so it cannot
be fused away; at 22 solver iterations per DFSPH step it was ~66 ms of a
~129 ms step.

The fix: run U gated sub-iterations per while-loop trip. Each
sub-iteration re-evaluates the ORIGINAL predicate on the current carry
and applies the body only where it holds (per-leaf `jnp.where` — the
arithmetic still executes, the state update is masked). The sequence of
REAL iterations is bit-identical to the unrolled==1 loop — iteration
counters, residuals, and stop flags advance only when the original
predicate holds — so convergence behavior and all downstream values are
exactly preserved (solver contracts, e.g. the reference's per-iteration
residual checks dfsph_solver.py:221-233,393-416, are unaffected). The
price is up to U-1 wasted (masked) body evaluations after convergence:
~0.5 ms of matvec arithmetic per wasted iteration versus ~3 ms of loop
overhead per saved trip — a large net win for any body cheaper than the
turnaround.
"""

from __future__ import annotations

from typing import Any, Callable, TypeVar

import jax
import jax.numpy as jnp

Carry = TypeVar("Carry")


def while_loop_unrolled(cond: Callable[[Carry], Any],
                        body: Callable[[Carry], Carry],
                        init: Carry, unroll: int = 1) -> Carry:
    """`lax.while_loop(cond, body, init)` with U sub-iterations per trip.

    Exact-semantics contract: sub-iteration k applies `body` iff
    `cond` holds on the carry AFTER sub-iteration k-1 — the realized
    iteration sequence equals the plain loop's for every leaf.
    """
    if unroll <= 1:
        return jax.lax.while_loop(cond, body, init)

    def gated(carry):
        pred = cond(carry)
        new = body(carry)
        return jax.tree.map(lambda a, b: jnp.where(pred, a, b), new, carry)

    def ubody(carry):
        for _ in range(unroll):
            carry = gated(carry)
        return carry

    return jax.lax.while_loop(cond, ubody, init)
