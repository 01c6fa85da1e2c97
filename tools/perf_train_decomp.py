"""Decompose the train step: backbone-only fwd+bwd vs full step.

Times grad(backbone-sum) — conv fwd + dgrad + wgrad + BN train moments,
no head/LBS/losses/optimizer — with the chained methodology, to separate
"conv backward roofline" from "everything else" in the train ledger.

Usage: python tools/perf_train_decomp.py [batch]
Env: TRAIN_BF16=1 (default 1 here), DECOMP_WHAT=backbone|backbone_fwd
"""

import os
import platform
import sys

import numpy as np


def main():
    cache_dir = os.environ.get(
        "SHAPY_TPU_COMPILE_CACHE",
        f"/tmp/shapy_tpu_xla_cache_{platform.node()}",
    )
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _build_flagship
    from shapy_tpu.models.backbones.hrnet import hrnet_forward
    from shapy_tpu.models.backbones.layers import ParamStore

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    what = os.environ.get("DECOMP_WHAT", "backbone")
    regressor = _build_flagship(subdivisions=5)
    bf16 = os.environ.get("TRAIN_BF16", "1") == "1"

    params = regressor.params["backbone"]
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(
        rng_np.normal(size=(batch_size, 256, 256, 3)).astype(np.float32))

    def fwd(p, x):
        if bf16:
            x = x.astype(jnp.bfloat16)
        store = ParamStore(p)
        store.fold_bn = False
        out = hrnet_forward(p, x, train=True, _store=store)
        return out["concat"].astype(jnp.float32).sum()

    if what == "backbone":
        def body(p, x):
            g = jax.grad(fwd)(p, x)
            # fold grads into a scalar-ish carry on x to serialise iters
            leaves = jax.tree_util.tree_leaves(g)
            s = sum(l.sum().astype(jnp.float32) for l in leaves)
            return x + (s * 1e-20).astype(x.dtype)
    else:
        def body(p, x):
            return x + (fwd(p, x) * 1e-20).astype(x.dtype)

    from shapy_tpu.utils.timing import chained_device_ms

    @jax.jit
    def run(p, x, k):
        y = jax.lax.fori_loop(0, k, lambda i, x: body(p, x), x)
        return y.mean()

    ms = chained_device_ms(
        lambda p, x, k: run(p, x, jnp.int32(k)), (params, images),
        ks=(2, 10), reps=3, verbose=True)
    print(f"{what} batch {batch_size}: {ms:.1f} ms  bf16={int(bf16)}")


if __name__ == "__main__":
    main()
