"""Which sub-stage of the L=32768 device stage kills the XLA compile
helper? Compile cumulative prefixes at long-read shapes."""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import numpy as np
import ma_tpu
ma_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp
from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import MinimizerIndex, minimizer_seeding
from ma_tpu.ops.filters import min_length, seed_lump
from ma_tpu.ops.soc import soc_collect
from ma_tpu.ops.harmonize import compact_harm, harmonization
from ma_tpu.pipeline.aligner import DeviceStageConfig, _harm_pack_core, _soc_min_score
from ma_tpu.config.parameters import ParameterSetManager

B, L = 32, 32768
GENOME = 10_000_000
rng = np.random.default_rng(1)
genome = rng.integers(0, 4, GENOME).astype(np.uint8)
pack = Pack.empty(); pack.append("g", genome)
mmi = MinimizerIndex.build(pack)
dev = mmi.to_device()
cst = jnp.asarray(np.asarray(pack.starts, np.int32))
rlf = pack.unpacked_size_forward_strand
mgr = ParameterSetManager(); mgr.set_selected("PacBio")
mgr.selected.set("Seeding Technique", "minimizers")
cfg = DeviceStageConfig.from_params(mgr.selected, L)
print("cfg:", cfg.max_seeds, cfg.max_socs_collect, cfg.max_socs_harm,
      cfg.seeds_per_soc, flush=True)
seqs = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.uint8), jnp.int32)
lens = jnp.asarray(np.full(B, 20000, np.int32))

def upto_seed(s, l):
    x = minimizer_seeding(dev, s, l, cst, rlf, k=cfg.mm_k, w=cfg.mm_w,
                          max_occ=cfg.max_ambiguity, max_seeds=cfg.max_seeds)
    return min_length(seed_lump(x), cfg.min_seed_len)

def upto_soc(s, l):
    return soc_collect(upto_seed(s, l), l, cst, match=cfg.match,
                       extend=cfg.extend, gap=cfg.gap,
                       fixed_width=cfg.fixed_soc_width,
                       rectangular=cfg.rectangular,
                       min_score=_soc_min_score(cfg, l, 2 * rlf),
                       max_socs=cfg.max_socs_collect)

def upto_harm(s, l):
    return harmonization(upto_soc(s, l), l, text_len=2*rlf,
                         max_socs=cfg.max_socs_harm, min_socs=cfg.min_socs,
                         seeds_per_soc=cfg.seeds_per_soc,
                         do_heuristics=cfg.do_heuristics,
                         switch_qlen=cfg.switch_qlen,
                         score_tolerance=cfg.score_tolerance,
                         harm_score_min=cfg.harm_score_min,
                         harm_score_min_rel=cfg.harm_score_min_rel,
                         score_diff_tolerance=cfg.score_diff_tolerance,
                         max_lookahead=cfg.max_lookahead,
                         max_delta_dist=cfg.max_delta_dist,
                         min_delta_dist=cfg.min_delta_dist, n_cand=cfg.n_cand)

def upto_pack(s, l):
    ch = compact_harm(upto_harm(s, l), cfg.max_out_sets)
    return _harm_pack_core(ch)

import jax
def reduce_all(t):
    return sum(jnp.sum(jnp.abs(x.astype(jnp.int32))) for x in jax.tree.leaves(t))

which = sys.argv[1] if len(sys.argv) > 1 else "all"
stages = {"seed": upto_seed, "soc": upto_soc, "harm": upto_harm, "pack": upto_pack}
todo = stages if which == "all" else {which: stages[which]}
for name, fn in todo.items():
    f = jax.jit(lambda s, l, fn=fn: reduce_all(fn(s, l)))
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(f(seqs, lens))
        print(f"{name}: compiled+ran in {time.perf_counter()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
