"""Bounded probe of the HRNet fuse/residual adds (BENCH.md train ledger:
14.1 ms/step fwd, 6.5%, "HBM-bound elementwise").

Question (round-4 VERDICT item 9): can layout changes or conv-epilogue
fusion recover any of that 14.1 ms at batch 128 — or are the add
fusions already at the chip's practical HBM roofline?

Method, three measurements on the real chip:

1. **Triad roofline** — chained fori_loop ``relu(c + b_j * (1+i*eps))``
   kernels timed from a profiler capture's DEVICE events (tunnel
   wall-clock noise never enters). Shapes at the real per-branch fuse
   sizes stay VMEM-resident across iterations and measure VMEM
   bandwidth (TB/s — a finding in itself); an 8x-batch variant with a
   >=600 MB working set measures the true HBM roofline. Bytes =
   (k reads + 1 write) * 2.
2. **Analytic minimal traffic** — from the W48 fuse topology (stage2
   1x2br, stage3 4x3br, stage4 3x4br @ 64/32/16/8 px, 48/96/192/384 ch):
   per target, write + identity read + coarse-size reads for upsampled
   contributions (nearest_upsample is broadcast+reshape, fusable into
   the add so the read happens at SOURCE resolution) + target-size
   reads for downsampled contributions. Minimal ms = bytes / triad GB/s.
3. **Profiled attribution** — jax.profiler capture of the backbone
   forward at batch 128; per-KERNEL device times joined with exact
   operand/output bytes parsed from the optimized HLO text
   (compiled.as_text()), so each elementwise fusion gets an achieved
   GB/s against the measured roofline.

Verdict rule: recoverable = measured_elementwise_ms - modeled_bytes /
HBM_roofline. Measured BELOW the model (the round-5 outcome: 10.5 ms vs
18.1 ms modeled) means XLA already serves part of the operands from
VMEM — nothing a rearrangement that materialises the same operands can
recover; REJECTED with numbers (BENCH.md round-5 ledger).

Usage: python tools/perf_fuse_probe.py [batch]
"""

import glob
import gzip
import json
import os
import platform
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (name, fine-H/W, channels) for the four W48 branch resolutions at a
# 256px crop (stem stride 4 -> 64px branch 0).
BRANCHES = ((64, 48), (32, 96), (16, 192), (8, 384))
# fuse instances: (num_modules, num_branches)
FUSES = ((1, 2), (4, 3), (3, 4))


def _time(fn, *args, iters=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _device_ms(events, steps):
    """Sum device-kernel ms per kernel name from a trace capture
    (X events carrying a tf_op attribution are the device stream)."""
    by_name = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not (e.get("args") or {}).get("tf_op"):
            continue
        n = e.get("name", "")
        by_name[n] = by_name.get(n, 0.0) + e["dur"] / 1e3 / steps
    return by_name


def _trace_events(logdir):
    hits = sorted(glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True))
    return json.loads(gzip.open(hits[-1], "rt").read()).get(
        "traceEvents", [])


def triad_roofline(batch):
    """Practical bf16 elementwise-add bandwidth at the real fuse shapes,
    from DEVICE time (a profiler capture of a chained fori_loop — the
    dev-tunnel's wall-clock noise never enters).

    Chained carry: c = relu(c + sum_j b_j * (1 + i * eps_j)). The
    per-iteration, per-operand scalar scale defeats loop-invariant
    hoisting (otherwise XLA would precompute sum(b_j) once); scalar
    multiplies fuse into the same loop so traffic is still exactly
    k reads + 1 write."""
    import jax
    import jax.numpy as jnp

    iters = 64
    rows = []
    # The real fuse shapes PLUS an 8x-batch variant whose working set
    # (>= 600 MB) cannot be kept VMEM-resident across loop iterations:
    # the small shapes fit in the 128 MB VMEM, so their chained loops
    # measure VMEM bandwidth; the big variant is the true HBM roofline.
    cases = [(side, ch, batch) for side, ch in BRANCHES[:3]]
    cases.append((64, 48, batch * 8))
    for (side, ch, b) in cases:
        for k in (2, 3, 4):
            shape = (b, side, side, ch)
            x0 = jnp.asarray(np.random.default_rng(9).normal(
                size=shape).astype(np.float32), dtype=jnp.bfloat16)
            bs = tuple(
                jnp.asarray(np.random.default_rng(i).normal(
                    size=shape).astype(np.float32), dtype=jnp.bfloat16)
                for i in range(k - 1))

            def body(i, c, operands=bs):
                s = i.astype(jnp.bfloat16)
                acc = c
                for j, b in enumerate(operands):
                    acc = acc + b * (1 + s * jnp.bfloat16(1e-6 * (j + 1)))
                return jax.nn.relu(acc) * jnp.bfloat16(0.999)

            @jax.jit
            def run(x, *ops):
                return jax.lax.fori_loop(
                    0, iters, lambda i, c: body(i, c, ops), x)

            run(x0, *bs).block_until_ready()
            logdir = "/tmp/fuse_probe_triad"
            os.system(f"rm -rf {logdir}")
            with jax.profiler.trace(logdir):
                run(x0, *bs).block_until_ready()
            by_name = _device_ms(_trace_events(logdir), iters)
            # the loop body is the dominant fusion kernel
            ms = max(by_name.values()) if by_name else float("nan")
            bytes_moved = (k + 1) * np.prod(shape) * 2
            # conservative: only count a case as a true HBM measurement
            # when the loop-resident working set is several times VMEM
            # (the 128-256 MB range was observed to still get reuse)
            hbm = bytes_moved / (k + 1) * k > 512 * 1024 * 1024
            rows.append((f"b{b} {side}px x{ch}ch k={k}", ms,
                         bytes_moved / (ms / 1e3) / 1e9, hbm))
    return rows


def analytic_fuse_bytes(batch):
    """Minimal fwd HBM traffic of every fuse add in the W48 graph."""
    total = 0
    per_stage = []
    for (mods, n) in FUSES:
        stage_bytes = 0
        for i in range(n):  # target branch
            hi, ci = BRANCHES[i]
            tgt = batch * hi * hi * ci
            b = 2 * tgt  # write + identity read
            for j in range(n):
                if j == i:
                    continue
                if j > i:  # upsampled: read at source resolution
                    hj, _ = BRANCHES[j]
                    b += batch * hj * hj * ci
                else:  # downsampled: read at target resolution
                    b += tgt
            stage_bytes += b
        stage_bytes *= mods * 2  # bf16
        per_stage.append(stage_bytes)
        total += stage_bytes
    return total, per_stage


def _parse_hlo_buffers(hlo_text):
    """name -> (output_bytes, {operand names}) for every instruction in
    the optimized entry computation; plus name -> is_elementwise_fusion."""
    import re

    def shape_bytes(tok):
        m = re.match(r"(bf16|f16|f32|s32|u32|s8|u8|pred)\[([\d,]*)\]", tok)
        if not m:
            return 0
        dt = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
              "s8": 1, "u8": 1, "pred": 1}[m.group(1)]
        dims = [int(d) for d in m.group(2).split(",") if d]
        return dt * int(np.prod(dims)) if dims else dt

    out_bytes, operands, kinds = {}, {}, {}
    inst_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?[^=]*?)\s*"
        r"([\w\-]+)\((.*)$")
    for raw in hlo_text.splitlines():
        # strip layout/metadata brace groups: they contain parens
        # (e.g. {0,3,2,1:T(8,128)(2,1)}) that break opcode detection
        line = raw
        while True:
            stripped = re.sub(r"\{[^{}]*\}", "", line)
            if stripped == line:
                break
            line = stripped
        m = inst_re.match(line)
        if not m:
            continue
        name, shape_part, opcode, rest = m.groups()
        toks = re.findall(
            r"(?:bf16|f16|f32|s32|u32|s8|u8|pred)\[[\d,]*\]", shape_part)
        out_bytes[name] = sum(shape_bytes(t) for t in toks)
        ops = re.findall(r"%?([\w.\-]+)", rest.split(")")[0])
        operands[name] = set(ops)
        kinds[name] = opcode
        if opcode == "fusion":
            kmatch = re.search(r"kind=k(\w+)", raw)
            kinds[name] = f"fusion:{kmatch.group(1) if kmatch else '?'}"
    return out_bytes, operands, kinds


def profile_fuse(batch):
    """Profile the backbone fwd; per-kernel ms joined with exact HLO
    operand/output shapes -> achieved GB/s per elementwise fusion."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from shapy_tpu.models.backbones.hrnet import hrnet_forward
    from shapy_tpu.models.backbones.layers import ParamStore

    regressor = _build_flagship(subdivisions=2)
    params = regressor.params["backbone"]
    images = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 256, 256, 3)).astype(np.float32))

    @jax.jit
    def fwd(p, x):
        store = ParamStore(p)
        store.fold_bn = False
        out = hrnet_forward(p, x.astype(jnp.bfloat16), train=True,
                            _store=store)
        return out["concat"].astype(jnp.float32).sum()

    compiled = fwd.lower(params, images).compile()
    out_bytes, operands, kinds = _parse_hlo_buffers(compiled.as_text())

    dt = _time(fwd, params, images, iters=10)
    logdir = "/tmp/fuse_probe_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            fwd(params, images).block_until_ready()

    ms_by_name = _device_ms(_trace_events(logdir), 3)

    rows = []
    for name, ms in ms_by_name.items():
        kind = kinds.get(name, "?")
        if kind.startswith("fusion:") and "Output" not in kind \
                and "Convolution" not in kind or kind in (
                    "add", "maximum", "broadcast"):
            in_b = sum(out_bytes.get(o, 0) for o in operands.get(name, ()))
            rows.append((name, kind, ms, in_b + out_bytes.get(name, 0)))
    rows.sort(key=lambda r: -r[2])
    return dt * 1e3, rows, ms_by_name, kinds


def main():
    cache_dir = os.environ.get(
        "SHAPY_TPU_COMPILE_CACHE",
        f"/tmp/shapy_tpu_xla_cache_{platform.node()}")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print(f"device: {jax.devices()[0].device_kind}, batch {batch}")

    print("\n-- triad roofline (standalone relu(sum) at fuse shapes) --")
    best = 0.0
    for name, ms, gbs, hbm in triad_roofline(batch):
        tag = "HBM" if hbm else "fits-VMEM"
        print(f"  {name:26s} {ms:7.3f} ms  {gbs:7.1f} GB/s  [{tag}]")
        if hbm:
            best = max(best, gbs)

    total_bytes, per_stage = analytic_fuse_bytes(batch)
    minimal_ms = total_bytes / (best * 1e9) * 1e3
    print(f"\n-- analytic minimal fuse traffic: {total_bytes / 1e6:.1f} MB "
          f"-> {minimal_ms:.2f} ms at {best:.0f} GB/s --")
    for (mods, n), b in zip(FUSES, per_stage):
        print(f"  stage {n}br x{mods}: {b / 1e6:7.1f} MB")

    print("\n-- profiled backbone fwd: per-kernel elementwise roofline --")
    step_ms, rows, ms_by_name, kinds = profile_fuse(batch)
    ew_ms = sum(r[2] for r in rows)
    ew_bytes = sum(r[3] for r in rows)
    print(f"  fwd step: {step_ms:.1f} ms; elementwise/reduce kernels: "
          f"{ew_ms:.2f} ms, {ew_bytes / 1e6:.0f} MB exact HLO traffic")
    print(f"  {'kernel':28s} {'kind':14s} {'ms':>7s} {'MB':>8s} "
          f"{'GB/s':>7s}")
    for name, kind, ms, b in rows[:18]:
        gbs = b / (ms / 1e3) / 1e9 if ms > 0 else 0
        print(f"  {name[:28]:28s} {kind:14s} {ms:7.3f} {b / 1e6:8.1f} "
              f"{gbs:7.1f}")

    minimal_ew_ms = ew_bytes / (best * 1e9) * 1e3
    recover = ew_ms - minimal_ew_ms
    print(f"\nVERDICT: elementwise measured {ew_ms:.2f} ms vs minimal "
          f"{minimal_ew_ms:.2f} ms at the {best:.0f} GB/s triad roofline "
          f"-> recoverable {recover:.2f} ms "
          f"({'REJECT — at roofline' if recover < 1.5 else 'investigate'})")
    print(f"(fuse-add subset, analytic: {total_bytes / 1e6:.0f} MB -> "
          f"{minimal_ms:.2f} ms minimum)")


if __name__ == "__main__":
    main()
