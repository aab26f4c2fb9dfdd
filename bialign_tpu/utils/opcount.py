"""Programmatic VPU-op accounting for the Pallas fill kernels.

The bench's speed-of-light figure (``vpu_peak_fraction``) needs an
ops-per-cell count.  Round 3 used a hand-counted literal (360); this
module derives it from the kernel's own traced computation instead: the
per-diagonal slab update (:func:`bialign_tpu.ops.pallas_dp._make_update`)
is a pure jnp function, so ``jax.make_jaxpr`` yields exactly the
arithmetic the kernel executes per diagonal, and summing element counts
over ALU equations gives ops/diagonal without running anything.

Counting model (documented so the peak fraction is interpretable):

* counted as 1 VPU ALU op per output element: integer add/sub/mul,
  max/min, compares, bitwise ops, select_n (the lowering of jnp.where),
  and the lane/sublane rolls (data movement through the VPU crossbar);
* NOT counted: broadcasts/reshapes/iota/constants (layout, usually
  folded), and the boolean-conversion glue XLA folds into the select.
* the kernel executes the FULL [W, W, Ppad] slab on every one of the D
  diagonals; genuine 4D cells total (n+1)(m+1)W^2.  The executed-op
  rate therefore exceeds the genuine-cell rate by Ppad*D/((n+1)(m+1))
  (~2.2x for the square DNA-Pol pair: inactive lattice rows at the
  band's triangular ends are computed and discarded).  Both fractions
  are reported.

Why the single-pair triangular ends are NOT maskable (round-4 review
asked for ragged row-windowing): for pairs up to 1024 residues the
whole row axis [SUB=8, LANES=128] is exactly ONE int32 vreg per
(q, sk, sl) coordinate, so the live window [d-m, min(n, d)] is an
intra-vreg range — vreg ops are all-or-nothing, and the only way to
shrink them is packing the 81 (q, sk, sl) coordinates onto sublanes
(81 does not tile the 8-sublane vreg; every shift then becomes 2-3
vreg ops instead of a free leading-axis reselect — projected net
< 1.3x at high risk to bit-exactness).  The shipped answer removes the
waste ACROSS pairs instead: the conveyor kernel
(ops/pallas_dp, batched score fills) streams a bucket's pairs through
one slab phase-offset by T0 ~ M+2 steps, so one pair's draining
triangle overlaps the next pair's ramp — sustained executed/genuine
~Ppad/(n+1) (~1.1x) for corpus workloads, where throughput actually
matters; the lone-pair fill keeps its latency-bound 2.2x.

Peak model: 8 sublanes x 128 lanes x 8 ALU slots x 0.94 GHz ~ 7.7e12
int32 ops/s.  The slot count is inferred, not quoted: under a 4-slot
model the measured executed-op rate (cells/s x ops/cell x padding
ratio) exceeds "peak" by ~1.8x, which is physically impossible, so the
VPU must retire ~8 of these ALU ops per lane-cycle (consistent with
fused multi-op issue on v5e-class cores).  Treat the absolute fraction
as model-dependent; the trend across rounds is the signal.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# ALU-like primitives: one op per output element
_ALU_PRIMS = {
    "add", "sub", "mul", "max", "min", "rem", "div",
    "eq", "ne", "ge", "gt", "le", "lt",
    "and", "or", "not", "xor", "select_n", "clamp",
    "tpu_roll", "roll", "dynamic_slice",  # vreg shifts in _shift_i
    "abs", "neg", "sign",
}

# layout/glue primitives: zero cost in this model.  "jit"/"pjit" are
# containers whose inner equations are counted by the recursion.
_FREE_PRIMS = {
    "broadcast_in_dim", "reshape", "transpose", "iota", "squeeze",
    "convert_element_type", "concatenate", "slice", "pad",
    "stop_gradient", "copy", "pjit", "jit", "closed_call",
}


def _count_jaxpr(jaxpr) -> dict:
    """Sum per-primitive output element counts over a (closed) jaxpr."""
    ops: dict = {}

    def visit(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            # recurse into any sub-jaxprs (cond/scan/pjit)
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    visit(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for it in v:
                        if hasattr(it, "jaxpr"):
                            visit(it.jaxpr)
            n_elems = sum(
                int(np.prod(ov.aval.shape)) for ov in eqn.outvars
                if hasattr(ov.aval, "shape")
            )
            ops[name] = ops.get(name, 0) + n_elems
        return ops

    visit(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr)
    return ops


def update_ops_per_diagonal(S: int, params, SUB: int = 8,
                            affine: bool = True) -> dict:
    """Trace one slab update and count its ALU ops.

    Returns a dict with ``alu_ops`` (counted ops per diagonal),
    ``uncounted`` (element count in primitives outside both lists —
    should be ~0; reported for auditability), ``per_prim`` breakdown,
    and ``slab_cells`` (W*W*SUB*LANES lattice points per diagonal).
    """
    from ..ops import pallas_dp

    W = 2 * S + 1
    LANES = pallas_dp.LANES
    if affine:
        update = pallas_dp._make_update(S, tuple(params), SUB)
    else:
        update = pallas_dp._make_nonaffine_update(S, tuple(params), SUB)
    Q = 9 if affine else None
    slab_shape = ((Q, W, W, SUB, LANES) if affine
                  else (W, W, SUB, LANES))
    args = (
        jax.ShapeDtypeStruct((), jnp.int32),           # traced d
        jax.ShapeDtypeStruct((SUB, LANES), jnp.int32),
        jax.ShapeDtypeStruct((W, W, SUB, LANES), jnp.int32),
        jax.ShapeDtypeStruct(slab_shape, jnp.int32),
        jax.ShapeDtypeStruct(slab_shape, jnp.int32),
    )
    jaxpr = jax.make_jaxpr(update)(*args)
    per_prim = _count_jaxpr(jaxpr)
    alu = sum(v for k, v in per_prim.items() if k in _ALU_PRIMS)
    uncounted = sum(
        v for k, v in per_prim.items()
        if k not in _ALU_PRIMS and k not in _FREE_PRIMS
    )
    return {
        "alu_ops": int(alu),
        "uncounted": int(uncounted),
        "per_prim": per_prim,
        "slab_cells": W * W * SUB * LANES,
    }


def ops_per_cell(S: int, params, SUB: int = 8, affine: bool = True) -> float:
    """ALU ops per slab lattice cell for one diagonal update."""
    c = update_ops_per_diagonal(S, params, SUB, affine)
    return c["alu_ops"] / c["slab_cells"]


VPU_PEAK_OPS = 8 * 128 * 8 * 0.94e9  # v5e-class modeled peak (see module doc)


def peak_fraction(cells_per_s: float, S: int, params, *, n: int, m: int,
                  Ppad: int = 1024, affine: bool = True) -> dict:
    """End-to-end VPU utilization of a measured fill rate.

    ``cells_per_s`` counts GENUINE 4D cells (the bench's metric); the
    kernel executes the full Ppad-row slab on all D = n+m+1 diagonals,
    so the executed-op rate is the genuine rate scaled by
    Ppad*D/((n+1)(m+1)) (module doc).  Returns both fractions.
    """
    opc = ops_per_cell(S, params, affine=affine)
    genuine = cells_per_s * opc / VPU_PEAK_OPS
    D = n + m + 1
    executed = genuine * (Ppad * D) / ((n + 1) * (m + 1))
    return {
        "ops_per_cell": round(opc, 1),
        "genuine_fraction": genuine,
        "executed_fraction": executed,
    }
