"""Headline benchmark: segment + classify one 2000x2000 multi-laser spectral
FOV on one chip (BASELINE.md north star: < 1 s/chip).

Runs the fused single-program pipeline (pipeline/fused.fov_step): FFT
registration over 4 lasers -> NL-means -> fused LP-CV enhancement -> KMeans ->
CCL seeding -> watershed -> relabel -> segment_sum spectra -> check heads ->
gated-metric kNN barcode calls for up to 8192 cells against a 127-code
reference matrix.

Prints ONE JSON line: {"metric", "value" (megapixels/s/chip), "unit",
"vs_baseline" (speedup vs the 1 s target)}. "extra" carries two further
configurations:
  * ecoli_10bit  (BENCH_10B=0 to skip): 5-laser 95-channel 2000^2 FOV through
    the fused erosion-seeded engine + full 1023-class kNN classifier
    (reference matrix thinned via prototype averaging,
    knn_prototypes_per_class).
  * volume_3d    (BENCH_3D=0 to skip): the reference's 2020x2020x170 8-tile
    stitched volume end-to-end (tools/bench3d.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("HIPRFISH_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np

from hiprfish_tpu.utils.platform import apply_compile_cache_env, \
    maybe_register_pinned_axon_session

maybe_register_pinned_axon_session()
apply_compile_cache_env()

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")


def _cached_fov(tag: str, builder):
    """Disk-cache a host-built synthetic FOV fixture under ``.bench_cache``.

    The two 2000^2 fixture builds cost 95.6 s + 80.9 s of host time in the
    BENCH_r04 driver run — the proximate cause of its rc=124 timeout. The
    pixels are a pure function of the generator params, so they are
    write-once: the ``tag`` must encode every param that shapes the pixels
    (bump its version suffix when the generator changes). Delete
    ``.bench_cache/fov_*.npz`` to force a rebuild."""
    path = os.path.join(CACHE_DIR, f"fov_{tag}.npz")
    if os.path.exists(path):
        t0 = time.time()
        with np.load(path) as z:
            fov = {
                "stack": [z[f"stack_{i}"] for i in range(int(z["n_lasers"]))],
                "truth_labels": z["truth_labels"],
            }
        print(f"# fixture {tag} loaded from cache ({time.time()-t0:.1f}s)",
              file=sys.stderr)
        return fov
    t0 = time.time()
    fov = builder()
    print(f"# fixture {tag} built in {time.time()-t0:.1f}s (caching to "
          f"disk)", file=sys.stderr)
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, n_lasers=len(fov["stack"]),
             truth_labels=fov["truth_labels"],
             **{f"stack_{i}": np.asarray(a, np.float32)
                for i, a in enumerate(fov["stack"])})
    os.replace(tmp, path)
    return {"stack": fov["stack"], "truth_labels": fov["truth_labels"]}


def _barcode_accuracy(seg_np, truth, codes_pred, cell_codes, codebook,
                      layout, n_found: int, max_cells: int):
    """Vectorized barcode accuracy vs planted ground truth: majority truth
    label per found cell via ONE packed np.unique pass (the per-cell
    ``truth[seg == lab]`` loop re-scanned the full FOV per cell — ~40 s of
    bench wall at 400 cells)."""
    pairs = (seg_np.astype(np.int64) << 32) | truth.astype(np.int64)
    vals, cnt = np.unique(pairs, return_counts=True)
    s = (vals >> 32).astype(np.int64)
    t = (vals & 0xFFFFFFFF).astype(np.int64)
    keep = (s > 0) & (s <= min(n_found, max_cells - 1)) & (t > 0)
    s, t, cnt = s[keep], t[keep], cnt[keep]
    majority = {}
    for si, ti in zip(s[np.argsort(cnt)], t[np.argsort(cnt)]):
        majority[int(si)] = int(ti)        # ascending counts: last wins
    correct = total = 0
    for lab, tid in majority.items():
        gt_code = layout.code_str(cell_codes[tid - 1])
        total += 1
        correct += codebook[codes_pred[lab]] == gt_code
    return correct, total


def bench_ecoli_10bit(size: int = 2000, n_cells: int = 400,
                      spc: int | None = None, max_cells: int = 8192):
    """The 10-bit configuration: 5-laser 95-channel FOV through the fused
    erosion-seeded engine + a full 1023-class classifier, with the kNN
    reference matrix thinned via prototype averaging
    (knn_prototypes_per_class, the default — keeps a spc=2000 (~2M row)
    training run servable on chip and averages away per-row noise)."""
    import jax
    import jax.numpy as jnp
    from hiprfish_tpu.config import TEN_BIT, ClassifierConfig, \
        SegmentationConfig
    from hiprfish_tpu.models import train as mtrain
    from hiprfish_tpu.models.classifier import train_classifier
    from hiprfish_tpu.pipeline import fused, fused_ecoli
    from hiprfish_tpu.utils import synthetic

    layout = TEN_BIT
    spc = spc or int(os.environ.get("BENCH_10B_SPC", "200"))
    rng = np.random.RandomState(0)
    all_codes = list(range(1, 1024))
    cell_codes = [all_codes[(i * 37) % 1023] for i in range(n_cells)]

    # Full 1023-class training set (spc rows/class) + violet derivative.
    # The built artifact is cached under its filename convention
    # (reference_simulate_{spc}_* like train_reference.py:2046) so bench
    # reruns skip training; delete .bench_cache to force a rebuild.
    from hiprfish_tpu.models.artifacts import load_classifier, save_classifier

    cache_dir = CACHE_DIR
    clf_path = os.path.join(
        cache_dir, f"reference_simulate_{spc}_excitation_adjusted_"
        "normalized_violet_derivative_umap_transform.npz")
    t0 = time.time()
    train_rows = 1023 * spc
    if os.path.exists(clf_path):
        clf = load_classifier(clf_path)
        print(f"# [10b] classifier loaded from cache ({time.time()-t0:.1f}s)",
              file=sys.stderr)
        train_s = 0.0
    else:
        lut = synthetic.fluorophore_spectra(layout)
        base = np.stack([synthetic.barcode_spectrum(layout, c, lut)
                         for c in all_codes])                     # (1023, 95)
        gains = rng.uniform(0.7, 1.3, (1023, spc, 1)).astype(np.float32)
        noise = rng.randn(1023, spc, layout.n_channels).astype(np.float32) \
            * 0.02
        spectra = np.clip(gains * base[:, None, :] + noise, 0, None)
        spectra = spectra.reshape(1023 * spc, layout.n_channels)
        spectra /= np.maximum(spectra.max(axis=1, keepdims=True), 1e-12)
        spectra = np.concatenate(
            [spectra, np.diff(spectra[:, :32], axis=1)], axis=1)
        code_strs = [layout.code_str(c) for c in all_codes for _ in range(spc)]
        checks = mtrain.check_bits_for_codes(layout, code_strs)
        clf = train_classifier(
            jax.random.PRNGKey(0), layout, spectra, code_strs, checks,
            ClassifierConfig(check_train_steps=300), violet_derivative=True)
        train_s = time.time() - t0
        os.makedirs(cache_dir, exist_ok=True)
        save_classifier(clf_path, clf)
    clf_arrays, clf_static = fused.classifier_to_device_args(clf)
    print(f"# [10b] classifier: {len(clf.codebook)} classes, trained on "
          f"{train_rows} rows, kNN matrix {clf.train_features.shape} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    cfg = SegmentationConfig(**(
        {"scan_cap": int(os.environ["HIPRFISH_2D_SCAN_CAP"])}
        if os.environ.get("HIPRFISH_2D_SCAN_CAP") else {}))

    # AOT-compile the fused engine in a background thread while the host
    # builds the fixture (~80 s) — lower().compile() populates the same
    # executable cache the direct call hits (tests/test_warmup_aot.py),
    # so the ~60 s first-call compile disappears from bench wall time.
    import threading

    bounds = layout.block_bounds
    stack_specs = tuple(
        jax.ShapeDtypeStruct((size, size, bounds[i + 1] - bounds[i]),
                             jnp.float32)
        for i in range(layout.n_lasers))
    warm_t = threading.Thread(
        target=lambda: fused_ecoli.fov_step_ecoli.lower(
            stack_specs, clf_arrays, cfg, max_cells, clf_static).compile(),
        daemon=True)
    warm_t.start()

    fov = _cached_fov(
        f"10b_{size}_{n_cells}_v1",
        lambda: synthetic.make_fov(
            layout, cell_codes, shape=(size, size), seed=2,
            laser_shifts=[(0, 0), (2, -1), (0, 3), (-2, 0), (1, 1)],
            cell_axes=(9.0, 14.0)))
    stack = tuple(jax.device_put(np.asarray(a, np.float32))
                  for a in fov["stack"])
    jax.block_until_ready(stack)
    warm_t.join()

    step = lambda: fused_ecoli.fov_step_ecoli(stack, clf_arrays, cfg,
                                              max_cells, clf_static)
    t0 = time.time()
    seg, n_found, _, code_idx, _ = step()
    seg.block_until_ready()
    print(f"# [10b] first call (compile+run): {time.time()-t0:.1f}s, "
          f"cells: {int(n_found)}", file=sys.stderr)

    correct, total = _barcode_accuracy(
        np.asarray(seg), fov["truth_labels"], np.asarray(code_idx),
        cell_codes, list(clf.codebook), layout, int(n_found), max_cells)
    acc = correct / max(total, 1)

    times = []
    for _ in range(5):
        t0 = time.time()
        out = step()
        out[0].block_until_ready()
        times.append(time.time() - t0)
    t_sync = float(np.median(times))
    # pipelined: queue back-to-back, one scalar sync (same rationale as the
    # 7-bit config — the per-call loop pays a tunnel round-trip per FOV)
    n_q = 8
    t0 = time.time()
    outs = [step() for _ in range(n_q)]
    float(outs[-1][1])
    t = (time.time() - t0) / n_q
    print(f"# [10b] steady-state: {t*1000:.1f} ms/FOV pipelined x{n_q} "
          f"({t_sync*1000:.1f} per-call), accuracy {acc:.4f} "
          f"({correct}/{total})", file=sys.stderr)
    return {
        "ms_per_fov": round(t * 1000, 1),
        "ms_per_fov_sync": round(t_sync * 1000, 1),
        "megapixels_per_s": round(size * size / 1e6 / t, 2),
        "barcode_accuracy": round(acc, 4),
        "cells": int(n_found),
        "classes": len(clf.codebook),
        "knn_rows": int(clf.train_features.shape[0]),
        "train_rows": train_rows,
        "train_s": round(train_s, 1),
    }


def main():
    import jax
    from hiprfish_tpu.config import SEVEN_BIT, ClassifierConfig, SegmentationConfig
    from hiprfish_tpu.models import train as mtrain
    from hiprfish_tpu.models.classifier import train_classifier
    from hiprfish_tpu.pipeline import fused
    from hiprfish_tpu.utils import synthetic

    size = int(os.environ.get("BENCH_SIZE", "2000"))
    n_cells = int(os.environ.get("BENCH_CELLS", "400"))
    max_cells = 8192

    layout = SEVEN_BIT
    rng = np.random.RandomState(0)
    all_codes = list(range(1, 128))
    cell_codes = [all_codes[i % 127] for i in range(n_cells)]
    import jax.numpy as jnp

    # Train a 127-code classifier from simulated reference spectra (needs
    # no fixture — run it first so the engine compile can overlap the
    # fixture build below). Cached on disk like the 10-bit one.
    from hiprfish_tpu.models.artifacts import load_classifier, save_classifier

    clf_path = os.path.join(CACHE_DIR, "bench_headline_7b_127x50_v1.npz")
    if os.path.exists(clf_path):
        clf = load_classifier(clf_path)
    else:
        spectra_lut = synthetic.fluorophore_spectra(layout)
        rows, code_strs = [], []
        for c in all_codes:
            spec = synthetic.barcode_spectrum(layout, c, spectra_lut)
            r = rng.uniform(0.7, 1.3, (50, 1)) * spec[None, :] \
                + rng.randn(50, layout.n_channels) * 0.02
            rows.append(np.clip(r, 0, None))
            code_strs += [layout.code_str(c)] * 50
        spectra = np.concatenate(rows).astype(np.float32)
        spectra = spectra / np.maximum(
            spectra.max(axis=1, keepdims=True), 1e-12)
        checks = mtrain.check_bits_for_codes(layout, code_strs)
        clf = train_classifier(jax.random.PRNGKey(0), layout, spectra,
                               code_strs, checks,
                               ClassifierConfig(check_train_steps=300))
        os.makedirs(CACHE_DIR, exist_ok=True)
        save_classifier(clf_path, clf)
    clf_arrays, clf_static = fused.classifier_to_device_args(clf)
    print(f"# classifier: {len(clf.codebook)} codes, "
          f"{clf.train_features.shape[0]} reference rows", file=sys.stderr)

    cfg = SegmentationConfig(**(
        {"scan_cap": int(os.environ["HIPRFISH_2D_SCAN_CAP"])}
        if os.environ.get("HIPRFISH_2D_SCAN_CAP") else {}))

    # AOT-compile the engine in a background thread, overlapped with the
    # ~130 s host fixture build (see bench_ecoli_10bit for the mechanism).
    import threading

    bounds = layout.block_bounds
    stack_specs = tuple(
        jax.ShapeDtypeStruct((size, size, bounds[i + 1] - bounds[i]),
                             jnp.float32)
        for i in range(layout.n_lasers))
    warm_t = threading.Thread(
        target=lambda: fused.fov_step.lower(
            stack_specs, clf_arrays, cfg, max_cells, clf_static,
            True).compile(),
        daemon=True)
    warm_t.start()

    fov = _cached_fov(
        f"7b_{size}_{n_cells}_v1",
        lambda: synthetic.make_fov(
            layout, cell_codes, shape=(size, size), seed=1,
            laser_shifts=[(0, 0), (2, -1), (0, 3), (-2, 0)],
            cell_axes=(7.0, 12.0)))
    # Stage the FOV on device once (production loaders stream FOVs ahead of
    # compute; the benchmark measures the on-chip pipeline).
    stack = tuple(jax.device_put(np.asarray(a, np.float32))
                  for a in fov["stack"])
    jax.block_until_ready(stack)
    warm_t.join()

    step = lambda: fused.fov_step(stack, clf_arrays, cfg, max_cells,
                                  clf_static, True)

    t0 = time.time()
    out = step()
    out.segmentation.block_until_ready()
    compile_and_first = time.time() - t0
    print(f"# first call (compile+run): {compile_and_first:.1f}s; "
          f"cells found: {int(out.n_cells)}", file=sys.stderr)

    # Barcode accuracy vs planted ground truth (cells matched by majority
    # overlap with the truth label image).
    correct, total = _barcode_accuracy(
        np.asarray(out.segmentation), fov["truth_labels"],
        np.asarray(out.code_idx), cell_codes, list(clf.codebook), layout,
        int(out.n_cells), max_cells)
    acc = correct / max(total, 1)
    print(f"# barcode accuracy vs ground truth: {acc:.4f} "
          f"({correct}/{total})", file=sys.stderr)

    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = step()
        out.segmentation.block_until_ready()
        times.append(time.time() - t0)
    t_sync = float(np.median(times))
    print(f"# steady-state (per-call sync): {t_sync*1000:.1f} ms/FOV "
          f"(min {min(times)*1000:.1f}, max {max(times)*1000:.1f})",
          file=sys.stderr)

    # Pipelined throughput: queue n_q independent executions and sync once.
    # Production loaders stream FOVs ahead of compute, so back-to-back
    # device execution is the throughput the chip actually delivers; the
    # per-call number above additionally pays one full tunnel round-trip
    # per FOV (~35-40 ms here), which is a property of this dev setup, not
    # of the pipeline. Sync via a scalar host read — block_until_ready
    # alone does not reliably block under the tunneled platform.
    n_q = 8
    t0 = time.time()
    outs = [step() for _ in range(n_q)]
    # the device runs queued programs in order: the last result's scalar
    # read implies all n_q executions completed
    float(outs[-1].n_cells)
    t = (time.time() - t0) / n_q
    mp = size * size / 1e6
    print(f"# steady-state (pipelined x{n_q}): {t*1000:.1f} ms/FOV",
          file=sys.stderr)

    extra = {
        "ms_per_fov": round(t * 1000, 1),
        "ms_per_fov_sync": round(t_sync * 1000, 1),
        "barcode_accuracy": round(acc, 4),
        "cells": int(out.n_cells),
        "device": str(jax.devices()[0]),
    }

    # Out-of-distribution accuracy scene (VERDICT r04 #7): the classifier
    # and the in-distribution fixture share the same generative family, so
    # the 1.0000 above measures self-consistency. This scene shifts the
    # distribution along four axes the classifier was NOT fit on — wider
    # PSF (sigma 1.6 px blur), a 2D illumination gradient (0.52x..1.62x
    # corner-to-corner), +-1-channel spectral crosstalk (12% bleed, a
    # shifted covariance), and a different cell-size distribution
    # (5.5 x 16 px axes vs 7 x 12) — then reports accuracy through the
    # SAME compiled engine. Mirrors the reference's validation posture:
    # known-barcode ground truth on messy images
    # (hiprfish_imaging_collect_measurement_results.py:43-67).
    if os.environ.get("BENCH_OOD", "1") != "0":
        ood_codes = [all_codes[(i * 13) % 127] for i in range(n_cells)]

        def _build_ood():
            from scipy.ndimage import gaussian_filter
            f = synthetic.make_fov(
                layout, ood_codes, shape=(size, size), seed=7,
                laser_shifts=[(0, 0), (-3, 2), (1, -2), (2, 2)],
                cell_axes=(5.5, 16.0), noise=0.02)
            gy = (0.65 + 0.7 * np.linspace(0, 1, size))[:, None, None]
            gx = (0.8 + 0.4 * np.linspace(0, 1, size))[None, :, None]
            planes = []
            for plane in f["stack"]:
                p = (plane * gy * gx).astype(np.float32)
                p = gaussian_filter(p, sigma=(1.6, 1.6, 0))
                q = 0.76 * p
                q[:, :, 1:] += 0.12 * p[:, :, :-1]
                q[:, :, :-1] += 0.12 * p[:, :, 1:]
                planes.append(q.astype(np.float32))
            return {"stack": planes, "truth_labels": f["truth_labels"]}

        oodf = _cached_fov(f"7b_ood_{size}_{n_cells}_v1", _build_ood)
        stack_o = tuple(jax.device_put(np.asarray(a, np.float32))
                        for a in oodf["stack"])
        jax.block_until_ready(stack_o)
        out_o = fused.fov_step(stack_o, clf_arrays, cfg, max_cells,
                               clf_static, True)
        out_o.segmentation.block_until_ready()
        c_o, t_o = _barcode_accuracy(
            np.asarray(out_o.segmentation), oodf["truth_labels"],
            np.asarray(out_o.code_idx), ood_codes, list(clf.codebook),
            layout, int(out_o.n_cells), max_cells)
        extra["ood"] = {
            "accuracy": round(c_o / max(t_o, 1), 4),
            "matched_cells": t_o,
            "cells": int(out_o.n_cells),
            "shifts": "psf_blur=1.6px, illum_gradient=0.52-1.62x, "
                      "crosstalk=12% +-1ch, cell_axes=5.5x16",
        }
        print(f"# OOD scene accuracy: {c_o}/{t_o} = "
              f"{c_o / max(t_o, 1):.4f} ({int(out_o.n_cells)} cells found)",
              file=sys.stderr)

    print(json.dumps({
        "metric": "segment+classify throughput (2000x2000 4-laser FOV, "
                  "63ch, 127-code kNN)",
        "value": round(mp / t, 3),
        "unit": "megapixels/s/chip",
        "vs_baseline": round(1.0 / t, 3),
        "extra": extra,
    }))


def bench_cli_fresh_process(timeout_s: int = 900):
    """Fresh-subprocess CLI timing with the warmup story (VERDICT r04 #6):

      warmup_s : ``cli.warmup`` pre-seeding the persistent compile cache
                 for this FOV size — the once-per-machine setup step a
                 deployment runs at install time (pays the engine's XLA
                 compile the FIRST time; later bench runs find it cached).
      first_s  : the first real ``cli.measure`` process after warmup —
                 what a fresh machine's first FOV actually costs once
                 setup ran (the r04 unwarmed number was 265 s,
                 PROFILE_r04.md).
      second_s : the steady per-rule process cost of the reference's
                 Snakemake-style fan-out (ecoli/Snakefile:78-82).

    All three run in their own interpreter against the pinned
    compile-cache session (utils.platform)."""
    import subprocess
    import tempfile

    td = tempfile.mkdtemp(prefix="bench_cli_")
    fix = (
        "import numpy as np, os\n"
        "from hiprfish_tpu.config import TEN_BIT\n"
        "from hiprfish_tpu.utils import synthetic\n"
        "codes = [5, 37, 515, 1023, 96, 640, 17, 260, 770]\n"
        "fov = synthetic.make_fov(TEN_BIT, codes, shape=(192, 192), seed=1,\n"
        "    laser_shifts=[(0,0),(2,-1),(0,3),(-2,0),(1,1)],\n"
        "    cell_axes=(9.0, 14.0))\n"
        f"os.chdir({td!r})\n"
        "for lz, arr in enumerate(fov['stack']):\n"
        "    np.save('bench_cli_enc_5_%d.npy' % lz,\n"
        "            np.asarray(arr, np.float32))\n"
    )
    out = {}
    try:
        subprocess.run([sys.executable, "-c", fix], check=True,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"),
                       timeout=timeout_s, capture_output=True)
        names = sorted(f for f in os.listdir(td) if f.endswith(".npy"))
        # the CLI subprocess runs from the artifact dir: put the repo on
        # PYTHONPATH while KEEPING the deployment's boot-hook path (the
        # TPU plugin registers from a sitecustomize reached via PYTHONPATH)
        repo = os.path.dirname(os.path.abspath(__file__))
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-m", "hiprfish_tpu.cli.warmup", "--family",
             "ecoli", "--size", "192", "--max_cells", "4096"], cwd=td,
            capture_output=True, text=True, timeout=timeout_s, env=env)
        out["warmup_s"] = round(time.time() - t0, 1)
        if p.returncode != 0:
            out["error"] = "warmup: " + (p.stderr or p.stdout)[-300:]
            return out
        # Each measure child gets its own timeout and a failure records an
        # error WITHOUT skipping the remaining child: a wedged tunnel
        # compile service can hang one fresh process while the next one
        # (cache-hit only) is fine — measured 2026-08-21, first_s hung at
        # the 900 s ceiling and the abort threw away the second_s number.
        per_run_timeout = min(timeout_s, 480)
        for run in ("first_s", "second_s"):
            t0 = time.time()
            try:
                p = subprocess.run(
                    [sys.executable, "-m", "hiprfish_tpu.cli.measure", "-i",
                     *names], cwd=td, capture_output=True, text=True,
                    timeout=per_run_timeout, env=env)
            except subprocess.TimeoutExpired:
                out[run] = None
                out.setdefault("errors", {})[run] = \
                    f"timed out after {per_run_timeout}s"
                continue
            out[run] = round(time.time() - t0, 1)
            if p.returncode != 0:
                out.setdefault("errors", {})[run] = \
                    (p.stderr or p.stdout)[-300:]
        out["note"] = ("warmup = cli.warmup pre-seeding (once per machine/"
                       "size); first/second = fresh cli.measure "
                       "interpreters against the shared pinned "
                       "compile-cache session")
    except Exception as e:  # the extra must never take down the bench
        out["error"] = repr(e)[:300]
    return out


def _run_config_subprocess(config: str, timeout_s: int = 1500):
    """One bench config in a fresh process. Each config's working set is a
    multi-GB fraction of HBM; residual arrays + executables from a previous
    config in the same process tip the 95-channel / 3D configs into
    RESOURCE_EXHAUSTED (measured), and only one process can hold the TPU at
    a time — so the orchestrator never touches jax and the configs run
    strictly sequentially, each with the whole chip."""
    import subprocess

    env = dict(os.environ, BENCH_CONFIG=config)
    # Pin the axon session id across config subprocesses so the persistent
    # compile cache hits (the boot hook salts cache keys with a uuid4 per
    # process, so without this every config pays its full XLA compiles —
    # measured 2.73 s -> 0.11 s cross-process on a pinned id; see
    # utils.platform.maybe_register_pinned_axon_session). The subprocesses
    # run strictly sequentially, so one session id is never used
    # concurrently. HIPRFISH_AXON_SESSION overrides the stable default;
    # set it empty to disable pinning.
    sid = os.environ.get("HIPRFISH_AXON_SESSION", "hiprfish-bench-v1")
    if sid and os.environ.get("PALLAS_AXON_POOL_IPS"):
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["HIPRFISH_AXON_MANUAL_SESSION"] = sid
    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, text=True, env=env,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        # one stuck config must not take down the whole bench: record the
        # timeout and keep the other configs' numbers
        tail = (e.stderr or b"")
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        sys.stderr.write(tail[-2000:])
        return {"error": f"{config} timed out after {timeout_s}s"}
    sys.stderr.write(p.stderr)
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    return {"error": f"no JSON from {config}: "
                     f"{(p.stdout or p.stderr)[-200:]}"}


def _run_config_with_retry(config: str, timeout_s: int = 1500):
    """Retry a failed config once in a fresh process. Device OOMs here are
    load-dependent, not deterministic: a cold first attempt runs its AOT
    warmup compiles concurrently with the multi-GB fixture (measured
    2026-08-18: the 3D config died in a transient RESOURCE_EXHAUSTED
    cascade that even broke persistent-cache entry *reads*), while a retry
    finds those compiles cached and runs with far less transient pressure."""
    result = _run_config_subprocess(config, timeout_s)
    if "error" in result and "timed out" not in str(result.get("error")):
        sys.stderr.write(f"# {config} failed ({result['error']!r}); "
                         "retrying once in a fresh process\n")
        retry = _run_config_subprocess(config, timeout_s)
        if "error" not in retry:
            return retry
        result["retry_error"] = retry["error"]
    return result


def orchestrate():
    """Run every config and print the headline JSON line INCREMENTALLY: a
    complete, parseable metric line is (re)printed after each config lands,
    so a driver timeout mid-run still leaves the last line holding every
    number that completed (BENCH_r04.json was rc=124 with ``parsed: null``
    because the single final print never executed). Last-line-wins: each
    line supersedes the previous one."""
    def emit(obj):
        print(json.dumps(obj), flush=True)

    headline = _run_config_with_retry("headline")
    if "extra" not in headline:
        emit(headline)
        return
    emit(headline)
    if os.environ.get("BENCH_10B", "1") != "0":
        headline["extra"]["ecoli_10bit"] = _run_config_with_retry("10b")
        emit(headline)
    # CLI timing runs BEFORE the 3D config: measured right after the 3D
    # subprocess both CLI children ran ~3-14x slower (121/176 s vs the
    # clean 265-cold/12.6-warm), i.e. the 3D run leaves the shared
    # terminal session in a state the next process pays for.
    if os.environ.get("BENCH_CLI", "1") != "0":
        headline["extra"]["cli_fresh_process"] = bench_cli_fresh_process()
        emit(headline)
    if os.environ.get("BENCH_3D", "1") != "0":
        headline["extra"]["volume_3d"] = _run_config_with_retry("3d")
        emit(headline)


if __name__ == "__main__":
    config = os.environ.get("BENCH_CONFIG")
    if config is None:
        orchestrate()
    elif config == "headline":
        main()
    elif config == "10b":
        try:
            print(json.dumps(bench_ecoli_10bit()))
        except Exception as e:
            print(json.dumps({"error": repr(e)[:200]}))
    elif config == "3d":
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools"))
            import bench3d

            print(json.dumps(bench3d.run()))
        except Exception as e:
            print(json.dumps({"error": repr(e)[:200]}))
