import sys, time
sys.path.insert(0, "."); sys.path.insert(0, "tests")
import jax, jax.numpy as jnp
import numpy as np
from bench import make_frames, make_system
frames = make_frames(60)
system = make_system(enable_loop_closing=False)
for t, g, d in frames:
    system.track_rgbd_pipelined(t, g, d)
system.flush_pipeline()
m = system.map; cfg = system.cfg
kf = jnp.int32(system.ref_kf); cam = system.cam
win_cap, fix_cap, pts_cap = system._ba_caps()
from ydorbslam_tpu.slam.mapping import build_local_ba, select_local_window
from ydorbslam_tpu.optim.schur import bundle_adjust
win, fixed, pts = select_local_window(m, kf, win_cap, fix_cap, pts_cap)
prob, _ = build_local_ba(m, win, fixed, pts, system.inv_sigma2_tab, obs_cap=cfg.capacity.local_ba_obs)
jax.block_until_ready(prob.T_cw)
ba = jax.jit(lambda p: bundle_adjust.__wrapped__(cam, p, iters1=5, iters2=10))
r = ba(prob); jax.block_until_ready(r[0])
for _ in range(3):
    t0 = time.perf_counter()
    outs = [ba(prob) for _ in range(10)]
    jax.block_until_ready(outs[-1][0])
    print("ba chained ms", (time.perf_counter() - t0) / 10 * 1000)
with jax.profiler.trace("/tmp/ba_trace2"):
    for _ in range(5):
        r = ba(prob)
    jax.block_until_ready(r[0])
