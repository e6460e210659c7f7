"""Stage-level cost map of the fused pipeline on the current device.

``python -m chalkydri_tpu.tools.perfprobe`` prints device-true per-stage
timings for the bench scene (BASELINE config #5 shape): every detector
stage individually (decimate, threshold+CCL, boundary extract+compact,
the cluster sort, segment stats under both backends, quad fit, refine,
decode), the full detect, and the full fused detect+pose step — plus an
on-device parity check of the segment-kernel backends. One run after any
kernel change re-derives the whole cost map that drives optimization
priorities (docs/maintenance.md roadmap).

Timing method (docs/performance.md): N iterations inside ONE ``lax.scan``
with an input perturbed per iteration so nothing is CSE'd, and a forced
host fetch of a scalar reduction — ``block_until_ready`` alone is not a
reliable barrier through a remote-TPU tunnel, and per-dispatch walls
include transport RTT. The scan dispatch itself costs a fixed ~30 ms on
the tunnel regardless of body or iteration count; devtime measures that
empty-body overhead once and SUBTRACTS it (at the old 50-iteration
setting without subtraction, every stage read ~0.6 ms high — which
mis-ranked sub-millisecond stages in the round-3 cost map).

``--cpu`` runs a 2-iteration functional smoke off-device (the numbers are
not TPU numbers; it proves the probe paths execute and is what CI can
run).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial


_N_ITERS = 200
_N_REPS = 3

# One dispatch of the scan harness costs a fixed wall overhead that has
# NOTHING to do with the measured op — on the tunneled axon backend it is
# the ~30 ms transport round trip. At the old 50 iterations that bias was
# +0.6 ms on EVERY stage number (it made the ~50 us decimate read as
# 0.65 ms and hid that the sort scales ~linearly in rows). devtime now
# measures the empty-body dispatch cost once per process and subtracts it.
_DISPATCH_MS = None


def _dispatch_overhead_ms(reps=5):
    """Fixed per-dispatch wall cost of the scan harness (empty body)."""
    global _DISPATCH_MS
    if _DISPATCH_MS is not None:
        return _DISPATCH_MS
    import jax
    import jax.numpy as jnp

    @jax.jit
    def empty():
        def body(c, i):
            return c + i.astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(8))
        return c

    float(empty())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(empty())
        best = min(best, (time.perf_counter() - t0) * 1000)
    _DISPATCH_MS = best
    return best


def devtime(fn, args, n=None, reps=None, perturb_idx=0):
    """ms/iteration of true device time for fn(*args)."""
    import jax
    import jax.numpy as jnp

    n = _N_ITERS if n is None else n
    reps = _N_REPS if reps is None else reps
    overhead = _dispatch_overhead_ms()

    @jax.jit
    def many(*args):
        def body(c, i):
            a = list(args)
            x = a[perturb_idx]
            if jnp.issubdtype(x.dtype, jnp.floating):
                a[perturb_idx] = x + (i % 2).astype(x.dtype) * 1e-7
            else:
                a[perturb_idx] = x ^ (i % 2).astype(x.dtype)
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c + s, None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return c

    float(many(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, ((time.perf_counter() - t0) * 1000 - overhead) / n)
    return max(best, 0.0)


def main() -> None:
    import os

    if "--cpu" in sys.argv:
        # Functional smoke-run off-device (numbers are not TPU numbers;
        # 2 iterations just prove the probe paths execute). The env var
        # must be set before the config update or the TPU plugin this
        # environment registers at interpreter startup still initializes
        # (and hangs when the device tunnel is down) — same double-force
        # as tests/conftest.py.
        os.environ["JAX_PLATFORMS"] = "cpu"

    import numpy as np
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        global _N_ITERS, _N_REPS
        _N_ITERS, _N_REPS = 2, 1

    import jax.numpy as jnp

    # bench.py lives at the repo root (one level above the package), not
    # necessarily the cwd.
    import chalkydri_tpu as _pkg

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))
    )
    from bench import BATCH, H, W, build_scene

    # Geometry overrides (e.g. --height 1304 --width 1600 --batch 2 probes
    # the reference's deployed frame size, which takes the row-blocked CCL
    # path): the bench scene is tiled/cropped to size — content realism
    # doesn't matter for stage costs beyond having tags + texture, and the
    # convergence-gated CCL sees the same structure density.
    def _arg(name, default):
        if name in sys.argv:
            return int(sys.argv[sys.argv.index(name) + 1])
        return default

    BATCH = _arg("--batch", BATCH)
    H2, W2 = _arg("--height", H), _arg("--width", W)
    from chalkydri_tpu.detector.cluster import (
        COMPACT_SLACK,
        _INT_MAX,
        MAX_EDGE_POINTS,
        _compact_blocks,
        cluster_candidates,
        extract_boundary_points,
    )
    from chalkydri_tpu.detector.pipeline import make_detector, make_post_cluster
    from chalkydri_tpu.detector.decode import make_decoder
    from chalkydri_tpu.detector.families import load_family
    from chalkydri_tpu.detector.homography import pack_neighborhood
    from chalkydri_tpu.detector.quad import fit_quads
    from chalkydri_tpu.detector.refine import refine_quads
    from chalkydri_tpu.detector.segment import label_components
    from chalkydri_tpu.detector.threshold import adaptive_threshold
    from chalkydri_tpu.geometry.field_layout import parse_field_layout
    from chalkydri_tpu.pipeline import build_rig_from_config, make_vision_pipeline

    results: dict[str, float] = {}

    def probe(name, fn, args, **kw):
        try:
            t = devtime(fn, args, **kw)
            results[name] = round(t, 4)
            print(f"{name}: {t:.3f} ms", flush=True)
            return t
        except Exception as e:  # noqa: BLE001 - report, keep probing
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            return None

    if "--hetero" in sys.argv:
        # Heterogeneous-rig characterization (VERDICT round-3 directive 8):
        # a mixed rig runs ONE fused launch per group (runtime/app.py
        # FusedGroup), dispatched back to back in group build order each
        # iteration — the device executes them serially, so the expected
        # per-iteration device cost is the SUM of the groups. This probe
        # measures each group's step alone and the pair dispatched
        # together (both bodies inside one scan harness, mirroring the
        # back-to-back dispatch) and reports pair/sum — ~1.0 means no
        # cross-group interference, <1.0 means XLA overlapped work.
        def build_group(gw, gh, nb):
            fr = build_scene()
            reps = (-(-gh // fr.shape[0]), -(-gw // fr.shape[1]))
            fr = np.tile(fr, reps)[:gh, :gw]
            frames_g = jnp.asarray(np.broadcast_to(fr, (nb, gh, gw)).copy())
            calib = {"fx": 1100.0, "fy": 1100.0, "cx": gw / 2, "cy": gh / 2,
                     "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
                     "width": gw, "height": gh}
            tags = [{"ID": t,
                     "pose": {"translation": {"x": 10.0 + 0.5 * t, "y": 4.0,
                                              "z": 1.0},
                              "rotation": {"quaternion": {"W": 0.0, "X": 0.0,
                                                          "Y": 0.0, "Z": 1.0}}}}
                    for t in (1, 5, 9, 13)]
            layout = parse_field_layout(
                {"tags": tags, "field": {"length": 16.5, "width": 8.0}},
                dtype=jnp.float32)
            cams = [{"calib": json.dumps({"OpenCVModel5": calib}),
                     "robot_to_cam": json.dumps(
                         {"roll": 0, "pitch": 0, "yaw": 0, "x": 0, "y": 0,
                          "z": 1.0})}] * nb
            params, rc = build_rig_from_config(cams, layout)
            return (make_vision_pipeline(layout, params, rc), frames_g,
                    jnp.zeros(nb, jnp.float32))

        # Geometry overrides let CI smoke-run the mode on CPU at small
        # sizes; the default is the deployed mixed rig.
        w1, h1 = _arg("--hetero-w1", 1600), _arg("--hetero-h1", 1304)
        w2, h2 = _arg("--hetero-w2", 1280), _arg("--hetero-h2", 800)
        step_a, f_a, g_a = build_group(w1, h1, 2)
        step_b, f_b, g_b = build_group(w2, h2, 2)
        t_a = probe(f"group_A_2x{w1}x{h1}", step_a, (f_a, g_a))
        t_b = probe(f"group_B_2x{w2}x{h2}", step_b, (f_b, g_b))
        t_ab = probe(
            "rig_pair_AB",
            lambda fa, ga, fb, gb: (step_a(fa, ga), step_b(fb, gb)),
            (f_a, g_a, f_b, g_b),
        )
        if t_a and t_b and t_ab:
            results["pair_vs_sum"] = round(t_ab / (t_a + t_b), 4)
            print(f"pair/sum: {results['pair_vs_sum']:.3f}", flush=True)
        print(json.dumps({"perfprobe_ms": results,
                          "device": str(jax.devices()[0])}), flush=True)
        return

    if "--qd1" in sys.argv:
        # Full-resolution (quad_decimate=1) cost map: the row-blocked CCL
        # path (threshold_ccl_blocked) and the full qd=1 detect. Defaults
        # to the reference's deployed 1304x1600 geometry at batch 2 (the
        # BENCH_NOTES round-4 table); --height/--width/--batch override.
        gh, gw, nb = _arg("--height", 1304), _arg("--width", 1600), _arg("--batch", 2)
        fr = build_scene()
        reps = (-(-gh // fr.shape[0]), -(-gw // fr.shape[1]))
        fr = np.tile(fr, reps)[:gh, :gw]
        frames_q = jnp.asarray(np.broadcast_to(fr, (nb, gh, gw)).copy())
        print(f"device: {jax.devices()[0]} shape: {frames_q.shape}", flush=True)

        det1 = make_detector(quad_decimate=1)
        d1 = det1(frames_q)
        ids1 = sorted(np.asarray(d1.ids[0])[np.asarray(d1.valid[0])].tolist())
        print(f"detect ids qd1: {ids1}", flush=True)
        t = probe("detect_full_qd1", det1, (frames_q,), n=100)
        if t:
            results["fps_per_chip_qd1"] = round(nb / t * 1000, 1)
            print(f"  = {results['fps_per_chip_qd1']:.0f} fps/chip", flush=True)
        use_blocked = (
            jax.devices()[0].platform not in ("cpu", "gpu")
            and os.environ.get("CHALKYDRI_NO_PALLAS") != "1"
        )
        if use_blocked:
            from chalkydri_tpu.ops.pallas.ccl_kernel import (
                _blocked_boundary_rows,
                _pick_block_rows,
                threshold_ccl_blocked,
            )

            probe("threshold_ccl_blocked", lambda g: threshold_ccl_blocked(g),
                  (frames_q,), n=100)
            probe("blocked_round0 (merge_rounds=0)",
                  lambda g: threshold_ccl_blocked(g, merge_rounds=0),
                  (frames_q,), n=100)
            wp = (gw + 127) // 128 * 128
            hb = _pick_block_rows(gh, wp)
            hp = -(-gh // hb) * hb

            def prep(g):
                gp = g
                if hp != gh or wp != gw:
                    gp = jnp.pad(g, ((0, 0), (0, hp - gh), (0, wp - gw)))
                return _blocked_boundary_rows(gp, gh, gw, hb)

            probe("blocked_boundary_prep", prep, (frames_q,), n=100)
        print(json.dumps({"perfprobe_ms": results,
                          "device": str(jax.devices()[0])}), flush=True)
        return

    frame = build_scene()
    if (H2, W2) != (H, W):
        reps = (-(-H2 // H), -(-W2 // W))
        frame = np.tile(frame, reps)[:H2, :W2]
    H, W = H2, W2
    frames = jnp.asarray(np.broadcast_to(frame, (BATCH, H, W)).copy())
    print(f"device: {jax.devices()[0]} shape: {frames.shape}", flush=True)

    det = make_detector()
    d = det(frames)
    ids = sorted(np.asarray(d.ids[0])[np.asarray(d.valid[0])].tolist())
    print(f"detect ids: {ids}", flush=True)
    probe("detect_full", det, (frames,))

    # ---- stage 0: 2x2 mean decimation -----------------------------------
    h2, w2 = (H // 8) * 8, (W // 8) * 8

    def decimate(gray_batch):
        g = gray_batch[:, :h2, :w2]
        s = jax.lax.reduce_window(
            g.astype(jnp.uint16), jnp.uint16(0), jax.lax.add,
            window_dimensions=(1, 2, 2), window_strides=(1, 2, 2),
            padding="VALID",
        )
        return (s // 4).astype(jnp.uint8)

    probe("decimate_2x2", decimate, (frames,))
    small = jax.jit(decimate)(frames)

    # ---- stage 1: threshold + CCL (platform backend, as make_detector
    # selects it) ----------------------------------------------------------
    use_pallas = (
        jax.devices()[0].platform not in ("cpu", "gpu")
        and os.environ.get("CHALKYDRI_NO_PALLAS") != "1"
    )
    if use_pallas:
        from chalkydri_tpu.ops.pallas.ccl_kernel import (
            SINGLE_BLOCK_MAX_PIXELS,
            threshold_ccl_blocked,
            threshold_ccl_pallas,
        )

        def threshold_label_fn(small):
            if small.shape[1] * small.shape[2] <= SINGLE_BLOCK_MAX_PIXELS:
                return threshold_ccl_pallas(small)
            return threshold_ccl_blocked(small)

    else:

        def threshold_label_fn(small):
            tern = adaptive_threshold(small)
            return tern, label_components(tern)

    probe("threshold_ccl", threshold_label_fn, (small,))
    tern, labels = jax.jit(threshold_label_fn)(small)

    # ---- stage 2: boundary extraction + block compaction -----------------
    frame_w = int(tern.shape[2])

    def extract_compact(tern, labels):
        def one(tt, ll):
            black, white, payload = extract_boundary_points(tt, ll)
            if black.shape[0] > MAX_EDGE_POINTS:
                return _compact_blocks(
                    black, white, payload,
                    int(COMPACT_SLACK * MAX_EDGE_POINTS), frame_w)
            return black, white, payload, jnp.int32(0)

        return jax.vmap(one)(tern, labels)

    probe("extract_compact", extract_compact, (tern, labels))
    black, white, payload, dropped = jax.jit(extract_compact)(tern, labels)

    # ---- stage 1+2 fused: the in-kernel candidate emitter (what the
    # production detector runs when the decimated frame fits the VMEM
    # budget) — compare against threshold_ccl + extract_compact ----------
    if use_pallas:
        from chalkydri_tpu.detector.cluster import compact_candidates
        from chalkydri_tpu.ops.pallas.ccl_kernel import (
            EXTRACT_BLOCK_MAX_PIXELS,
            threshold_ccl_extract_pallas,
        )

        if small.shape[1] * small.shape[2] <= EXTRACT_BLOCK_MAX_PIXELS:
            w_small = small.shape[2]

            def emit_compact(small):
                bl, wh, pa = threshold_ccl_extract_pallas(small)
                return jax.vmap(
                    partial(compact_candidates, width=w_small)
                )(bl, wh, pa)

            probe("threshold_ccl_extract_compact (emitter)", emit_compact,
                  (small,))

    # ---- stage 3a: the hash + sort alone (the historical dominant line).
    # Production fuses the whole batch into ONE canonical 2-key sort with
    # the frame index in the key's high bits (cluster_candidates_batched);
    # this probe mirrors it exactly --------------------------------------
    from chalkydri_tpu.detector.cluster import HASH_BITS, _HASH_MASK

    def hash_sort(black, white, payload):
        bsz = black.shape[0]
        invalid = black == _INT_MAX
        key = (black * jnp.int32(-1640531527)) ^ (
            white * jnp.int32(-2048144789))
        key = key & _HASH_MASK
        key = jnp.where(key == _HASH_MASK, _HASH_MASK - 1, key)
        key = jnp.where(invalid, _HASH_MASK, key)
        fused = key | (jnp.arange(bsz, dtype=jnp.int32) << HASH_BITS)[:, None]
        sk, sp = jax.lax.sort(
            (fused.reshape(-1), payload.reshape(-1)),
            dimension=0, is_stable=False, num_keys=2)
        sk = sk.reshape(bsz, -1) & _HASH_MASK
        sk = jnp.where(sk == _HASH_MASK, _INT_MAX, sk)
        return sk, sp.reshape(bsz, -1)

    probe("cluster_sort", hash_sort, (black, white, payload))

    # ---- stage 3b: segment stats (post-sort), both backends --------------
    s_key, s_payload = jax.jit(hash_sort)(black, white, payload)
    s_key = s_key[:, :MAX_EDGE_POINTS]
    s_payload = s_payload[:, :MAX_EDGE_POINTS]

    from chalkydri_tpu.ops.pallas.segment_kernel import segment_stats_pallas

    def seg_kernel(k, p, interpret=False):
        return jax.vmap(lambda kk, pp: segment_stats_pallas(
            kk, pp, interpret=interpret))(k, p)

    def seg_scans(k, p):
        # the jnp fallback path of cluster_candidates, isolated
        def one(kk, pp):
            n = kk.shape[0]
            prev = jnp.concatenate([jnp.array([-1], jnp.int32), kk[:-1]])
            new_seg = kk != prev
            idx = jnp.arange(n, dtype=jnp.int32)
            start_pos = jax.lax.cummax(jnp.where(new_seg, idx, -1))
            nxt = jnp.where(new_seg, idx, _INT_MAX)
            next_start = jax.lax.cummin(nxt, reverse=True)
            next_start = jnp.concatenate(
                [next_start[1:], jnp.array([n], jnp.int32)])
            next_start = jnp.minimum(next_start, n)
            run_len = next_start - start_pos
            valid = kk != _INT_MAX
            score = jnp.where(new_seg & valid, run_len, 0)
            d0 = ((((pp >> 26) & 0x3) == 0) & valid).astype(jnp.int32)
            t = jnp.cumsum(d0)
            grid = score.reshape(n // 128, 128)
            m1 = grid.max(axis=1)
            a1 = grid.argmax(axis=1).astype(jnp.int32)
            col = jax.lax.broadcasted_iota(jnp.int32, grid.shape, 1)
            grid2 = jnp.where(col == a1[:, None], 0, grid)
            m2 = grid2.max(axis=1)
            a2 = grid2.argmax(axis=1).astype(jnp.int32)
            base = jnp.arange(grid.shape[0], dtype=jnp.int32) * 128
            return t, jnp.concatenate([m1, m2]), jnp.concatenate(
                [base + a1, base + a2])

        return jax.vmap(one)(k, p)

    if use_pallas:
        probe("segment_stats_pallas", seg_kernel, (s_key, s_payload))
    probe("segment_stats_jnp", seg_scans, (s_key, s_payload))

    # ---- stage 3: the whole cluster stage (production = the BATCHED fused
    # path), both backends, with parity ------------------------------------
    from chalkydri_tpu.detector.cluster import cluster_candidates_batched

    def clust(backend, black, white, payload):
        return cluster_candidates_batched(
            black, white, payload, segment_backend=backend)

    for backend in ("jnp", None):  # None = platform default
        label = backend or "auto"
        probe(f"cluster_total[{label}]",
              partial(clust, backend), (black, white, payload))
    cj = jax.jit(partial(clust, "jnp"))(black, white, payload)
    ca = jax.jit(partial(clust, None))(black, white, payload)
    for name in ("points", "mask", "count", "valid"):
        a, b = np.asarray(getattr(cj, name)), np.asarray(getattr(ca, name))
        assert np.array_equal(a, b), f"backend parity: {name}"
    print("cluster backend parity on device: OK", flush=True)
    clusters = ca

    # ---- stage 4: quad fit ------------------------------------------------
    def quads_fn(points, mask, valid):
        return jax.vmap(fit_quads)(points, mask, valid)

    probe("quad_fit", quads_fn, (clusters.points, clusters.mask,
                                 clusters.valid))
    quads = jax.jit(quads_fn)(clusters.points, clusters.mask, clusters.valid)

    # ---- stage 5/6: refine + decode on the compacted candidates ----------
    kq = 32
    score = jnp.where(quads.valid, clusters.count, jnp.int32(-1))
    _, sel = jax.lax.top_k(score, kq)
    q_corners = jnp.take_along_axis(
        quads.corners, sel[..., None, None], axis=1) * 2.0 + 0.5
    q_valid = jnp.take_along_axis(quads.valid, sel, axis=1)

    probe("pack_neighborhood", pack_neighborhood, (frames,))
    packed = jax.jit(pack_neighborhood)(frames)

    def refine_fn(packed, corners, valid):
        return jax.vmap(refine_quads)(packed, corners, valid)

    probe("refine", refine_fn, (packed, q_corners, q_valid), perturb_idx=1)
    r_corners = jax.jit(refine_fn)(packed, q_corners, q_valid)

    decode = make_decoder(load_family("tag36h11"), bits_corrected=3)

    def decode_fn(packed, corners, valid):
        return jax.vmap(decode)(packed, corners, valid)

    probe("decode", decode_fn, (packed, r_corners, q_valid), perturb_idx=1)

    # ---- post-cluster tail as one unit (quad->refine->decode->dedup) -----
    finish = make_post_cluster(decode)

    def finish_fn(gray, points, mask, count, valid, dropped):
        from chalkydri_tpu.detector.cluster import Clusters

        cl = Clusters(points=points, mask=mask, count=count, valid=valid,
                      dropped=dropped)
        return finish(gray, cl)

    probe("post_cluster_total", finish_fn,
          (frames, clusters.points, clusters.mask, clusters.count,
           clusters.valid, clusters.dropped), perturb_idx=1)

    # ---- full fused step (detect + solve); solve = step - detect ---------
    calib = {"fx": 1100.0, "fy": 1100.0, "cx": W / 2, "cy": H / 2,
             "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
             "width": W, "height": H}
    tags = [{"ID": t,
             "pose": {"translation": {"x": 10.0 + 0.5 * t, "y": 4.0, "z": 1.0},
                      "rotation": {"quaternion": {"W": 0.0, "X": 0.0,
                                                  "Y": 0.0, "Z": 1.0}}}}
            for t in (1, 5, 9, 13)]
    layout = parse_field_layout(
        {"tags": tags, "field": {"length": 16.5, "width": 8.0}},
        dtype=jnp.float32)
    cams = [{"calib": json.dumps({"OpenCVModel5": calib}),
             "robot_to_cam": json.dumps(
                 {"roll": 0, "pitch": 0, "yaw": 0, "x": 0, "y": 0, "z": 1.0})}
            ] * BATCH
    params, rc = build_rig_from_config(cams, layout)
    step = make_vision_pipeline(layout, params, rc)
    gyro = jnp.zeros(BATCH, jnp.float32)
    probe("full_step", lambda f, g: step(f, g), (frames, gyro))

    if "full_step" in results and "detect_full" in results:
        results["solve_est"] = round(
            results["full_step"] - results["detect_full"], 4)
        print(f"solve (step - detect): {results['solve_est']:.3f} ms",
              flush=True)

    print(json.dumps({"perfprobe_ms": results,
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
