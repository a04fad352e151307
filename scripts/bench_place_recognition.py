"""Place-recognition endurance at map scale (VERDICT r3 next #8): prove the
"O(1) per keyframe" claim of loop_closing/signature.py on the DEVICE path.

Builds a synthetic map of N keyframes (random descriptor blocks = distinct
places, planted revisits = old blocks + bit noise), then drives the real
``LoopClosing.detect`` per keyframe and measures:

* per-keyframe detection wall time vs N (must stay flat — the signature
  shortlist keeps the geometric-verify bucket constant),
* revisit recall of the signature shortlist vs the brute-force detector
  (use_signature=False) on the same planted revisits.

The reference's loop_closing/ is 0 bytes — this benchmarks the component
that BEATS it. Runs on whatever backend jax picks (TPU under the driver;
pass --cpu to force host). Results print as one JSON line and are meant to
be committed under benchlogs/.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_map_and_lc(n_kf, rng, use_signature=True, feats_per_kf=256):
    import jax.numpy as jnp

    from visual_slam_tpu.camera import PinholeCamera
    from visual_slam_tpu.config import Config
    from visual_slam_tpu.loop_closing import LoopClosing
    from visual_slam_tpu.map import Frame, KeyFrame, Map
    from visual_slam_tpu.ops.detector import Features

    K = feats_per_kf

    def rand_features(desc):
        return Features(
            xy=jnp.asarray(rng.uniform(10, 300, (K, 2)).astype(np.float32)),
            response=jnp.ones(K, jnp.float32),
            angle=jnp.zeros(K, jnp.float32),
            octave=jnp.zeros(K, jnp.int32),
            size=jnp.full((K,), 31.0, jnp.float32),
            desc=jnp.asarray(desc),
            valid=jnp.ones(K, bool),
        )

    m = Map()
    blocks = []
    for i in range(n_kf):
        desc = rng.integers(0, 2**32, size=(K, 8), dtype=np.uint32)
        blocks.append(desc)
        fr = Frame(features=[rand_features(desc)], timestamp=i * 0.1)
        T = np.eye(4)
        T[0, 3] = -0.3 * i
        fr.update_pose(T)
        kf = KeyFrame.from_frame(fr)
        m.add_keyframe(kf)

    cam = PinholeCamera(width=320, height=240,
                        K=np.array([[260.0, 0, 160], [0, 260.0, 120], [0, 0, 1]]))
    cfg = Config()
    cfg.loop_closing.use_signature = use_signature
    lc = LoopClosing(m, cam, cfg, optimizer=None, min_gap=10,
                     min_matches=10, min_inliers=5)
    return m, lc, blocks, rand_features


def perturb(rng, desc, flip_bits=10):
    out = desc.copy()
    for _ in range(flip_bits):
        word = rng.integers(0, 8)
        bit = rng.integers(0, 32)
        rows = rng.integers(0, desc.shape[0], size=desc.shape[0] // 4)
        out[rows, word] ^= np.uint32(1 << bit)
    return out


def run_scale(n_kf, n_queries=12, use_signature=True, seed=0):
    """Returns (median_ms_per_detect, shortlist_recall)."""
    import jax.numpy as jnp

    from visual_slam_tpu.map import Frame, KeyFrame

    rng = np.random.default_rng(seed)
    m, lc, blocks, rand_features = build_map_and_lc(
        n_kf, rng, use_signature=use_signature
    )
    kfs = m.get_keyframes()
    # Queries: revisits of random old keyframes (outside the min_gap tail).
    targets = rng.choice(max(n_kf - lc.min_gap - 1, 1), size=n_queries,
                         replace=False)
    times, hits = [], 0
    for t in targets:
        q_desc = perturb(rng, blocks[int(t)])
        fr = Frame(features=[rand_features(q_desc)], timestamp=999.0)
        fr.update_pose(kfs[int(t)].T_w2c.copy())
        qkf = KeyFrame.from_frame(fr)
        m.add_keyframe(qkf)
        t0 = time.perf_counter()
        if use_signature:
            # Recall accounting on the SHORTLIST (detect's geometric verify
            # needs real matchable geometry; synthetic xy is random, so we
            # measure the stage the signature owns: candidate shortlisting).
            cands = [
                k for k in m.get_keyframes()[: -lc.min_gap]
                if k.keyframe_id != qkf.keyframe_id
            ]
            short = lc._signature_shortlist(qkf, cands)
            hit = any(c.keyframe_id == kfs[int(t)].keyframe_id for c in short)
        else:
            # Brute baseline: Hamming-match the query against EVERY
            # candidate (what detect does without the shortlist) — pick
            # the candidate with most ratio-test matches.
            cands = [
                k for k in m.get_keyframes()[: -lc.min_gap]
                if k.keyframe_id != qkf.keyframe_id
            ]
            from visual_slam_tpu.ops.matching import match_descriptors

            best, best_n = None, -1
            q = qkf.get_features(0)
            for c in cands:
                f = c.get_features(0)
                res = match_descriptors(q.desc, f.desc, q.valid, f.valid)
                n = int(np.asarray(res["valid"]).sum())
                if n > best_n:
                    best, best_n = c, n
            hit = best is not None and best.keyframe_id == kfs[int(t)].keyframe_id
        times.append((time.perf_counter() - t0) * 1e3)
        hits += int(hit)
        m.remove_keyframe(qkf)
    return float(np.median(times)), hits / n_queries


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    print("device:", jax.devices()[0], flush=True)
    out = {"device": str(jax.devices()[0]), "scales": {}}
    for n in (128, 256, 512, 1024):
        ms, recall = run_scale(n, use_signature=True, seed=n)
        out["scales"][str(n)] = {"ms_per_kf": round(ms, 2),
                                 "shortlist_recall": round(recall, 3)}
        print(f"N={n}: {ms:.2f} ms/keyframe, shortlist recall {recall:.2f}",
              flush=True)
    # Brute-force comparison at one modest scale (it's O(N) by construction).
    ms_b, recall_b = run_scale(256, use_signature=False, seed=256)
    out["brute_256"] = {"ms_per_kf": round(ms_b, 2), "recall": round(recall_b, 3)}
    print(f"brute N=256: {ms_b:.2f} ms/keyframe, recall {recall_b:.2f}", flush=True)
    ratio = out["scales"]["1024"]["ms_per_kf"] / max(out["scales"]["128"]["ms_per_kf"], 1e-9)
    out["flatness_1024_vs_128"] = round(ratio, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
