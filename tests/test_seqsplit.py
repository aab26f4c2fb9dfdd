"""Sequence-split (context-parallel) wavefront: bit-exact scores across a
device mesh (8 virtual CPU devices, tests/conftest.py)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from bialign_tpu.aligner import BiAligner
from bialign_tpu.parallel.seqsplit import score_seqsplit

from golden import (
    TOY_RNA,
    TOY_RNA_AFFINE_PARAMS,
    TOY_RNA_AFFINE_SCORE,
    TOY_RNA_NONAFFINE_PARAMS,
    TOY_RNA_NONAFFINE_SCORE,
    TOY_PROTEIN,
    TOY_PROTEIN_PARAMS,
    TOY_PROTEIN_SCORE,
)


def _mesh_1d(k: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:k]), ("sp",))


def _tables(mol, params):
    ba = BiAligner(mol["seqA"], mol["seqB"], mol.get("strA"),
                   mol.get("strB"), engine="numpy", **params)
    return ba.mu1, ba.mu2, ba


@pytest.mark.parametrize("k", [1, 3, 8])
def test_affine_rna_seqsplit(k):
    mu1, mu2, ba = _tables(TOY_RNA, TOY_RNA_AFFINE_PARAMS)
    score = score_seqsplit(
        mu1, mu2, ba.max_shift, (ba.beta, ba.gamma, ba.delta),
        mesh=_mesh_1d(k), affine=True,
    )
    assert score == TOY_RNA_AFFINE_SCORE


@pytest.mark.parametrize("k", [2, 8])
def test_nonaffine_rna_seqsplit(k):
    mu1, mu2, ba = _tables(TOY_RNA, TOY_RNA_NONAFFINE_PARAMS)
    score = score_seqsplit(
        mu1, mu2, ba.max_shift, (ba.gamma, ba.delta),
        mesh=_mesh_1d(k), affine=False,
    )
    assert score == TOY_RNA_NONAFFINE_SCORE


def test_affine_protein_seqsplit():
    mu1, mu2, ba = _tables(TOY_PROTEIN, TOY_PROTEIN_PARAMS)
    score = score_seqsplit(
        mu1, mu2, ba.max_shift, (ba.beta, ba.gamma, ba.delta),
        mesh=_mesh_1d(8), affine=True,
    )
    assert score == TOY_PROTEIN_SCORE


def test_seqsplit_on_2d_mesh_axis():
    """The sp axis of a 2-D (data, sp) mesh works the same way."""
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "sp"))
    mu1, mu2, ba = _tables(TOY_RNA, TOY_RNA_AFFINE_PARAMS)
    score = score_seqsplit(
        mu1, mu2, ba.max_shift, (ba.beta, ba.gamma, ba.delta),
        mesh=mesh, axis="sp", affine=True,
    )
    assert score == TOY_RNA_AFFINE_SCORE


def test_seqsplit_random_vs_oracle():
    """Random integer score tables: sharded score == oracle score."""
    from bialign_tpu.ops import reference_dp

    rng = np.random.default_rng(7)
    n, m, S = 11, 13, 1
    mu1 = rng.integers(-300, 300, (n + 1, m + 1)).astype(np.int64)
    mu2 = rng.integers(-300, 300, (n + 1, m + 1)).astype(np.int64)
    beta, gamma, delta = -150, -50, -150
    H = reference_dp.fill_affine(mu1, mu2, S, beta, gamma, delta)
    want = reference_dp.affine_score_from_band(H, n, m, S)
    got = score_seqsplit(mu1, mu2, S, (beta, gamma, delta),
                         mesh=_mesh_1d(8), affine=True)
    assert got == want


@pytest.mark.parametrize("which,params", [
    ("affine", TOY_RNA_AFFINE_PARAMS),
    ("nonaffine", TOY_RNA_NONAFFINE_PARAMS),
])
def test_seqsplit_traceback_matches_single_device(which, params):
    """A mesh-sharded pair must yield the full bit-exact alignment (VERDICT
    r2 item 5): score AND all decoded lines equal the single-device run."""
    mol = TOY_RNA
    single = BiAligner(mol["seqA"], mol["seqB"], mol.get("strA"),
                       mol.get("strB"), engine="numpy", **params)
    want_score = single.optimize()
    want_lines = list(single.decode_trace())

    sharded = BiAligner(
        mol["seqA"], mol["seqB"], mol.get("strA"), mol.get("strB"),
        engine="xla", seqsplit_mesh=_mesh_1d(8), checkpoint_block=8,
        **params,
    )
    assert sharded.optimize() == want_score
    assert list(sharded.decode_trace()) == want_lines


def test_seqsplit_traceback_protein_full_outmode():
    mol, params = TOY_PROTEIN, dict(TOY_PROTEIN_PARAMS, outmode="full")
    single = BiAligner(mol["seqA"], mol["seqB"], mol["strA"], mol["strB"],
                       engine="xla", **params)
    sharded = BiAligner(
        mol["seqA"], mol["seqB"], mol["strA"], mol["strB"], engine="xla",
        seqsplit_mesh=_mesh_1d(8), **params,
    )
    assert sharded.optimize() == single.optimize() == TOY_PROTEIN_SCORE
    assert list(sharded.decode_trace()) == list(single.decode_trace())


def test_seqsplit_eval_trace_replay():
    """cells() on the sharded band: the verbose replay identity holds."""
    mol, params = TOY_RNA, TOY_RNA_NONAFFINE_PARAMS
    sharded = BiAligner(
        mol["seqA"], mol["seqB"], mol.get("strA"), mol.get("strB"),
        engine="xla", seqsplit_mesh=_mesh_1d(4), **params,
    )
    score = sharded.optimize()
    lines = list(sharded.eval_trace())
    assert lines, "verbose replay must produce lines"
    assert lines[-1].endswith(str(score))
