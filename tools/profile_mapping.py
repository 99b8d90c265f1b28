"""Micro-profile of the per-keyframe mapping programs on the live chip.

Breaks mapping_prep / mapping_finish into their sub-programs on a map
built by a short synthetic bench run and prints per-phase medians —
the regression companion to bench.py --profile's two coarse numbers.

Usage: python tools/profile_mapping.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def med_ms(f, n=8):
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        xs.append((time.perf_counter() - t0) * 1000)
    return float(np.median(xs))


def main():
    import jax
    import jax.numpy as jnp

    from bench import DEPTH_FACTOR, make_frames, make_system

    frames = make_frames(60)
    system = make_system(enable_loop_closing=False)
    for t, g, d in frames:
        system.track_rgbd_pipelined(t, g, d)
    system.flush_pipeline()
    print(f"keyframes: {system.n_keyframes}")

    m = system.map
    cfg = system.cfg
    o = cfg.orb
    kf = jnp.int32(system.ref_kf)
    kfc = jnp.int32(system.n_keyframes)
    cam = system.cam

    from ydorbslam_tpu.slam.mapping import (
        build_local_ba, cull_keyframes, cull_map_points, mapping_finish,
        mapping_prep, select_local_window,
    )
    from ydorbslam_tpu.optim.schur import bundle_adjust
    from ydorbslam_tpu.slam.triangulate import (
        fuse_neighbors_batch, triangulate_neighbors_batch,
    )

    win_cap, fix_cap, pts_cap = system._ba_caps()
    obs_cap = cfg.capacity.local_ba_obs
    print(f"ba caps: win={win_cap} fix={fix_cap} pts={pts_cap} obs={obs_cap}")

    def copy_map():
        mm = jax.tree.map(jnp.copy, m)
        jax.block_until_ready(mm.mp_pos)
        return mm

    # --- whole programs ---
    def prep():
        mm = copy_map()
        t0 = time.perf_counter()
        r = mapping_prep(
            mm, kf, kfc, cam, scale_factor=o.scale_factor,
            n_levels=o.n_levels, **system._prep_kw)
        jax.block_until_ready(r.mp_pos)
        return (time.perf_counter() - t0) * 1000

    def fin():
        mm = copy_map()
        t0 = time.perf_counter()
        r, snap = mapping_finish(
            mm, kf, cam, system.inv_sigma2_tab, system._depth_thr_dev,
            iters1=cfg.optim.local_ba_iters_1,
            iters2=cfg.optim.local_ba_iters_2,
            win_cap=win_cap, fix_cap=fix_cap, pts_cap=pts_cap,
            obs_cap=obs_cap,
            kf_cull_redundancy=cfg.mapping.kf_cull_redundancy)
        jax.block_until_ready(snap)
        return (time.perf_counter() - t0) * 1000

    print(f"mapping_prep_ms: {np.median([prep() for _ in range(6)]):.2f}")
    print(f"mapping_finish_ms: {np.median([fin() for _ in range(6)]):.2f}")

    # --- prep sub-phases (jitted separately; sum != fused total) ---
    w = m.covis[kf] * m.kf_valid.astype(jnp.int32)
    nvals, nids = jax.lax.top_k(w, system._prep_kw["n_neighbors"])
    nok = nvals > 0

    cull_j = jax.jit(lambda mm: cull_map_points.__wrapped__(mm, kfc))
    tri_j = jax.jit(
        lambda mm: triangulate_neighbors_batch(
            mm, kf, nids, nok, kfc, cam, o.scale_factor, o.n_levels
        )
    )
    fuse_j = jax.jit(
        lambda mm: fuse_neighbors_batch(
            mm, kf, nids, nok, cam, o.scale_factor, o.n_levels
        )
    )
    for name, fj in (("cull_points", cull_j), ("triangulate", tri_j),
                     ("fuse", fuse_j)):
        mm = copy_map()
        r = fj(mm)
        jax.block_until_ready(r.mp_pos)  # compile
        def run():
            mm = copy_map()
            t0 = time.perf_counter()
            rr = fj(mm)
            jax.block_until_ready(rr.mp_pos)
            return (time.perf_counter() - t0) * 1000
        print(f"  prep.{name}_ms: {np.median([run() for _ in range(6)]):.2f}")

    # --- finish sub-phases ---
    sel_j = jax.jit(
        lambda mm: select_local_window.__wrapped__(
            mm, kf, win_cap, fix_cap, pts_cap
        )
    )
    win, fixed, pts = sel_j(m)
    jax.block_until_ready(pts)
    print(f"  finish.select_ms: {med_ms(lambda: jax.block_until_ready(sel_j(m))):.2f}")

    build_j = jax.jit(
        lambda mm: build_local_ba.__wrapped__(
            mm, win, fixed, pts, system.inv_sigma2_tab, obs_cap=obs_cap
        )
    )
    prob, obs_sel = build_j(m)
    jax.block_until_ready(prob.T_cw)
    print(f"  finish.build_ms: {med_ms(lambda: jax.block_until_ready(build_j(m)[0].T_cw)):.2f}")

    for i1, i2 in ((0, 1), (1, 2), (5, 10)):
        ba_j = jax.jit(
            lambda p, a=i1, b=i2: bundle_adjust.__wrapped__(cam, p, iters1=a, iters2=b)
        )
        r = ba_j(prob)
        jax.block_until_ready(r[0])
        print(
            f"  finish.ba[{i1}+{i2}]_ms: "
            f"{med_ms(lambda: jax.block_until_ready(ba_j(prob)[0])):.2f}"
        )

    cullkf_j = jax.jit(
        lambda mm: cull_keyframes.__wrapped__(
            mm, kf, system._depth_thr_dev,
            redundancy=cfg.mapping.kf_cull_redundancy,
        )
    )
    r = cullkf_j(m)
    jax.block_until_ready(r.kf_valid)
    def run_ck():
        mm = copy_map()
        t0 = time.perf_counter()
        rr = cullkf_j(mm)
        jax.block_until_ready(rr.kf_valid)
        return (time.perf_counter() - t0) * 1000
    print(f"  finish.cull_kf_ms: {np.median([run_ck() for _ in range(6)]):.2f}")


if __name__ == "__main__":
    main()
