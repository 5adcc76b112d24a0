"""End-to-end A/B of cfg.registered_dtype on the fused 10-bit engine:
timing (pipelined x8) + barcode-call identity between f32 and bf16 at
production scale (2000^2, 400 cells, 1023-class classifier).

Usage: python tools/exp_regdtype.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("HIPRFISH_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from hiprfish_tpu.utils.platform import apply_platform_env

apply_platform_env()

from _timing import device_time_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from hiprfish_tpu.config import TEN_BIT, ClassifierConfig, \
        SegmentationConfig
    from hiprfish_tpu.models import train as mtrain
    from hiprfish_tpu.models.classifier import train_classifier
    from hiprfish_tpu.pipeline import fused, fused_ecoli
    from hiprfish_tpu.utils import synthetic

    layout = TEN_BIT
    size, max_cells = 2000, 8192
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache",
        "fov_10b_2000_400_v1.npz")
    with np.load(cache) as z:
        planes = [z[f"stack_{i}"] for i in range(int(z["n_lasers"]))]
    stack = tuple(jax.device_put(p) for p in planes)
    jax.block_until_ready(stack)

    rng = np.random.RandomState(0)
    all_codes = list(range(1, 1024))
    lut = synthetic.fluorophore_spectra(layout)
    base = np.stack([synthetic.barcode_spectrum(layout, c, lut)
                     for c in all_codes])
    spc = 20
    gains = rng.uniform(0.7, 1.3, (1023, spc, 1)).astype(np.float32)
    noise = rng.randn(1023, spc, layout.n_channels).astype(np.float32) * 0.02
    spectra = np.clip(gains * base[:, None, :] + noise, 0, None)
    spectra = spectra.reshape(1023 * spc, layout.n_channels)
    spectra /= np.maximum(spectra.max(axis=1, keepdims=True), 1e-12)
    spectra = np.concatenate(
        [spectra, np.diff(spectra[:, :32], axis=1)], axis=1)
    code_strs = [layout.code_str(c) for c in all_codes for _ in range(spc)]
    checks = mtrain.check_bits_for_codes(layout, code_strs)
    clf = train_classifier(
        jax.random.PRNGKey(0), layout, spectra, code_strs, checks,
        ClassifierConfig(check_train_steps=60), violet_derivative=True)
    clf_arrays, clf_static = fused.classifier_to_device_args(clf)
    print("# classifier ready", file=sys.stderr)

    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = SegmentationConfig(registered_dtype=dt)
        fn = lambda st, c=cfg: fused_ecoli.fov_step_ecoli(
            st, clf_arrays, c, max_cells, clf_static)
        t, out = device_time_ms(fn, stack, n=8, reps=3, warmup=1)
        seg, n, _, code_idx, _ = out
        n = int(n)
        outs[dt] = (np.asarray(code_idx)[:n + 1], n)
        print(f"{dt:<10} {t:7.2f} ms/FOV   cells={n}", flush=True)
    a, na = outs["float32"]
    b, nb = outs["bfloat16"]
    same = (na == nb) and bool(np.array_equal(a, b))
    print(f"cells f32={na} bf16={nb}; calls identical: {same}"
          + ("" if same else f"  (diffs: {int((a != b).sum())})"),
          flush=True)


if __name__ == "__main__":
    main()
