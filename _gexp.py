import time
import jax
from bialign_tpu.io.cfssp import read_molecule_from_file
from bialign_tpu.models.molecule import preprocess_molecule
from bialign_tpu.scoring.tables import build_score_tables
from bialign_tpu.ops import pallas_dp

ex = "/root/reference/Examples"
seqA, strA = read_molecule_from_file(f"{ex}/DNAPolymerase1_Escherichia.cfssp", "Protein")
seqB, strB = read_molecule_from_file(f"{ex}/DNAPolymerase1_Xanthomonas.cfssp", "Protein")
params = dict(type="Protein", structure_weight=800, simmatrix="BLOSUM62",
              gap_opening_cost=-150, gap_cost=-50, shift_cost=-150, max_shift=1)
molA = preprocess_molecule(seqA, strA, is_rna=False)
molB = preprocess_molecule(seqB, strB, is_rna=False)
mu1, mu2 = build_score_tables(molA, molB, params, is_rna=False)
n, m, S = len(seqA), len(seqB), 1
pt = (-150, -50, -150)
mu1d, mu2d = pallas_dp._diag_mu_tables_plast(mu1, mu2, S)
mu1d = jax.device_put(mu1d); mu2d = jax.device_put(mu2d)

import sys
caps = [int(x) for x in sys.argv[1:]]
for cap in caps:
    def pick(D, S_, Ppad, so, interp, cap=cap):
        if interp: return 1
        return int(min(cap, max(1, D)))
    pallas_dp._pick_chunk = pick
    pallas_dp._affine_pallas.clear_cache()
    t0 = time.perf_counter()
    out = pallas_dp._affine_pallas(mu1d, mu2d, n, m, S, pt, True, False)
    out.block_until_ready()
    tc = time.perf_counter() - t0
    sc = int(jax.device_get(pallas_dp._slab_score(out, S, n)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        o = pallas_dp._affine_pallas(mu1d, mu2d, n, m, S, pt, True, False)
        o.block_until_ready()
        ts.append(time.perf_counter() - t0)
    cells = (n+1)*(m+1)*(2*S+1)**2
    print(f"G={cap:4d} score={sc} compile={tc:.0f}s best={min(ts)*1e3:.2f}ms cells/s={cells/min(ts)/1e6:.1f}M", flush=True)
