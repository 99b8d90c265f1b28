"""Per-phase timing probe for the pipelined tracking hot path.

Measures, on the real device behind the tunnel:
  * image host->device transfer,
  * rgbd_frame_step dispatch overhead and chained device throughput,
  * ring_info fetch (the per-batch drain read),
  * read_ring + insert_keyframe + mapping_prep (per-keyframe cost),
  * mapping_finish (deferred local BA) cost,
  * _refresh_trkset cost.

Run:  python tools/profile_phases.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def timeit(fn, n=10, warm=2):
    for _ in range(warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def main():
    import jax
    import jax.numpy as jnp

    from synthetic import SyntheticRgbdSequence
    from ydorbslam_tpu.config import (
        CameraConfig, OrbConfig, SlamConfig, TrackingConfig,
    )
    from ydorbslam_tpu.slam.system import SlamSystem, Sensor

    cfg = SlamConfig(
        tracking=TrackingConfig(min_init_depth_points=100),
        camera=CameraConfig(
            fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0,
            width=640, height=480,
        ),
        orb=OrbConfig(n_features=1000),
    )
    rng = np.random.default_rng(0)
    n_frames = 30
    seq = SyntheticRgbdSequence(rng, n_frames=n_frames, n_landmarks=800)
    frames = [seq.frame(i) for i in range(n_frames)]

    system = SlamSystem(cfg, Sensor.RGBD, enable_loop_closing=False)
    system.enable_pipelined(lag=8)
    t0 = time.perf_counter()
    system.precompile()
    print(f"precompile: {time.perf_counter()-t0:.1f} s")

    # warm the pipeline
    for t, g, d in frames[:10]:
        system.track_rgbd_pipelined(t, g, d)
    system.flush_pipeline()

    g0 = frames[10][1]
    d0 = frames[10][2]

    # --- 1. image transfer ---
    ms = timeit(lambda: jax.block_until_ready(jnp.asarray(g0, jnp.float32)))
    print(f"transfer gray f32 (1.2MB): {ms:.2f} ms")
    g8 = g0.astype(np.uint8)
    ms = timeit(lambda: jax.block_until_ready(jnp.asarray(g8)))
    print(f"transfer gray u8 (0.3MB): {ms:.2f} ms")
    d16 = (d0 * 5000).astype(np.uint16)
    ms = timeit(lambda: jax.block_until_ready(jnp.asarray(d16)))
    print(f"transfer depth u16 (0.6MB): {ms:.2f} ms")

    # --- 2. frame step: dispatch overhead (no block) vs chained throughput ---
    from ydorbslam_tpu.slam.pipeline import rgbd_frame_step

    o = cfg.orb
    kw = dict(
        n_features=o.n_features, capacity=cfg.n_keypoints,
        n_levels=o.n_levels, scale_factor=o.scale_factor,
        th_high=o.ini_th_fast, th_low=o.min_th_fast,
        min_motion=cfg.tracking.min_matches_motion,
        min_local=cfg.tracking.min_matches_local_map,
        min_init=cfg.tracking.min_init_depth_points,
        min_after_reloc=cfg.tracking.min_matches_after_reloc,
        fps=max(1, int(cfg.camera.fps)),
        close_tracked_max=cfg.tracking.kf_close_tracked_max,
        close_untracked_min=cfg.tracking.kf_close_untracked_min,
    )
    gj = jnp.asarray(g0, jnp.float32)
    dj = jnp.asarray(d0, jnp.float32)

    st = system._dstate
    # dispatch-only cost
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        st = rgbd_frame_step(
            st, gj, dj, system._trkset, system.cam, system.inv_sigma2_tab,
            jnp.float32(system.depth_threshold), **kw)
    disp_ms = (time.perf_counter() - t0) / n * 1000
    jax.block_until_ready(st.ring_info)
    # chained throughput (includes device execution, serialised by state dep)
    t0 = time.perf_counter()
    for _ in range(n):
        st = rgbd_frame_step(
            st, gj, dj, system._trkset, system.cam, system.inv_sigma2_tab,
            jnp.float32(system.depth_threshold), **kw)
    jax.block_until_ready(st.ring_info)
    chain_ms = (time.perf_counter() - t0) / n * 1000
    print(f"frame_step dispatch-only: {disp_ms:.2f} ms;"
          f" chained (device-bound): {chain_ms:.2f} ms")
    system._dstate = st

    # include fresh host image each step (the real loop's transfer)
    t0 = time.perf_counter()
    for i in range(n):
        tt, gg, dd = frames[i % 10]
        st = rgbd_frame_step(
            st, jnp.asarray(gg, jnp.float32), jnp.asarray(dd, jnp.float32),
            system._trkset, system.cam, system.inv_sigma2_tab,
            jnp.float32(system.depth_threshold), **kw)
    jax.block_until_ready(st.ring_info)
    chain_tx_ms = (time.perf_counter() - t0) / n * 1000
    print(f"chained + per-frame transfers: {chain_tx_ms:.2f} ms")
    system._dstate = st

    # --- 3. ring fetch ---
    ms = timeit(lambda: np.asarray(system._dstate.ring_info), n=10)
    print(f"ring_info fetch: {ms:.2f} ms")

    # --- 4. read_ring ---
    from ydorbslam_tpu.slam.pipeline import read_ring

    def rr():
        f, m, T = read_ring(system._dstate, 3)
        jax.block_until_ready(T)
    print(f"read_ring (block): {timeit(rr, n=5):.2f} ms")

    # --- 5. mapping_prep / mapping_finish / trkset ---
    from ydorbslam_tpu.slam.mapping import mapping_finish, mapping_prep

    def prep():
        # mapping_prep donates the map; copy per call
        m0 = jax.tree.map(jnp.copy, system.map)
        jax.block_until_ready(m0.mp_pos)
        t0 = time.perf_counter()
        m = mapping_prep(
            m0, jnp.int32(system.ref_kf), jnp.int32(system.n_keyframes),
            system.cam, scale_factor=o.scale_factor, n_levels=o.n_levels,
            **system._prep_kw)
        jax.block_until_ready(m.mp_pos)
        return (time.perf_counter() - t0) * 1000

    xs = [prep() for _ in range(5)]
    print(f"mapping_prep (block): {np.median(xs):.2f} ms")

    win_cap, fix_cap, pts_cap = system._ba_caps()

    def fin():
        m0 = jax.tree.map(jnp.copy, system.map)
        jax.block_until_ready(m0.mp_pos)
        t0 = time.perf_counter()
        m, snap = mapping_finish(
            m0, jnp.int32(system.ref_kf), system.cam, system.inv_sigma2_tab,
            jnp.float32(system.depth_threshold),
            iters1=cfg.optim.local_ba_iters_1,
            iters2=cfg.optim.local_ba_iters_2,
            win_cap=win_cap, fix_cap=fix_cap, pts_cap=pts_cap,
            obs_cap=cfg.capacity.local_ba_obs,
            kf_cull_redundancy=cfg.mapping.kf_cull_redundancy)
        jax.block_until_ready(snap)
        return (time.perf_counter() - t0) * 1000

    xs = [fin() for _ in range(3)]
    print(f"mapping_finish (block): {np.median(xs):.2f} ms")

    def trk():
        system._refresh_trkset()
        jax.block_until_ready(system._trkset.pos)
    print(f"refresh_trkset (block): {timeit(trk, n=5):.2f} ms")

    # --- 5b. decompose the tracking step ---
    from ydorbslam_tpu.ops.extractor import extract_orb
    from ydorbslam_tpu.ops.stereo import fill_depth_from_rgbd
    from ydorbslam_tpu.slam.matchers import (
        match_local_points, match_motion_model_two,
    )
    from ydorbslam_tpu.optim.pose import PoseObservations, optimize_pose

    eo = jax.jit(lambda g: extract_orb(
        g, system.cam, n_features=o.n_features, capacity=cfg.n_keypoints,
        n_levels=o.n_levels, scale_factor=o.scale_factor,
        th_high=o.ini_th_fast, th_low=o.min_th_fast, has_distortion=False))
    feats = eo(gj)
    jax.block_until_ready(feats.uv)

    def ex():
        jax.block_until_ready(eo(gj).uv)
    print(f"  extract_orb: {timeit(ex, n=10):.2f} ms")

    st2 = system._dstate
    T_pred = st2.velocity @ st2.T_cw

    def mm():
        a7, a14 = match_motion_model_two(
            system.cam, feats, st2.last, st2.last_lms, st2.last_lms_valid,
            T_pred, st2.T_cw, th_narrow=7.0, th_wide=14.0,
            n_levels=o.n_levels, scale_factor=o.scale_factor)
        jax.block_until_ready(a7)
    mm()
    print(f"  match_motion_two: {timeit(mm, n=10):.2f} ms")

    ts = system._trkset

    def ml():
        a, _ = match_local_points(
            system.cam, feats, T_pred, ts.pos, ts.desc, ts.normal,
            ts.dmax, ts.dmin, ts.valid, th=1.0,
            n_levels=o.n_levels, scale_factor=o.scale_factor)
        jax.block_until_ready(a)
    ml()
    print(f"  match_local (8192x1024): {timeit(ml, n=10):.2f} ms")

    po = PoseObservations(
        p_w=st2.last_lms,
        obs_uvr=jnp.concatenate([feats.uv, feats.right_u[:, None]], -1),
        inv_sigma2=system.inv_sigma2_tab[feats.octave],
        has_stereo=feats.right_u >= 0,
        valid=feats.valid & st2.last_lms_valid,
    )

    def pl():
        T, _, n = optimize_pose(system.cam, T_pred, po)
        jax.block_until_ready(T)
    pl()
    print(f"  optimize_pose (4x10): {timeit(pl, n=10):.2f} ms")

    # --- 6. end-to-end per-frame (same as bench) ---
    nkf0 = system.n_keyframes
    times = []
    for t, g, d in frames[10:]:
        t0 = time.perf_counter()
        system.track_rgbd_pipelined(t, g, d)
        times.append((time.perf_counter() - t0) * 1000)
    t0 = time.perf_counter()
    system.flush_pipeline()
    drain = (time.perf_counter() - t0) * 1000
    print("per-frame ms:", " ".join(f"{x:.1f}" for x in times))
    print(f"final flush: {drain:.1f} ms")
    print(f"keyframes inserted in {len(times)} frames: "
          f"{system.n_keyframes - nkf0}")
    print(f"fps: {len(times)/ (sum(times)+drain) * 1000:.1f}")


if __name__ == "__main__":
    main()
