"""Compiler-side attribution of the headline step (VERDICT r4 item 7).

Compiles the EXACT bench.py step program (10-step lazy-shell scan at the
headline config) and reports, from the compiler's own numbers:

  - cost_analysis(): total FLOPs / transcendentals / bytes accessed per
    step, versus the slot-pair roofline model (candidate slot-pairs x
    ops/pair at the 2.39 TFMA/s VPU ceiling, docs/BENCHMARKS.md round 4);
  - memory_analysis(): peak VMEM/HBM of the compiled program;
  - an optimized-HLO fusion census: op mix and the largest fusion outputs
    (is the step one big sweep fusion or fragmented?).

Pass a measured ms/step (from tools/tpu_bench.py) to get the implied
achieved-FLOPs rate.  Compile-only: runs nothing on the device beyond
what jit-compile itself needs, so it is cheap behind the gate.

Usage: python tools/step_attr.py [nx] [lj|eam] [measured_ms_per_step]
"""
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from comd_tpu import Config
from comd_tpu.sim import init_simulation, LazySimState

VPU_FMA_PER_S = 2.39e12   # measured v5e ceiling (tools/vpu_ceiling.py)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 63
    doeam = (sys.argv[2] if len(sys.argv) > 2 else "eam") == "eam"
    measured_ms = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    block = 10

    cfg = Config(nx=nx, ny=nx, nz=nx, doeam=doeam, temperature=600.0,
                 dtype="float32", max_atoms=0, cell_mode="auto",
                 pot_dir="/root/repo/pots")
    t0 = time.time()
    sim = init_simulation(cfg)
    print(f"init {time.time()-t0:.1f}s atoms={sim.n_global} "
          f"A={sim.cfg.max_atoms} grid={sim.geom.grid} "
          f"sweep={sim.cfg.resolved_sweep_impl} "
          f"chunk={sim.cfg.resolved_box_chunk}", flush=True)

    # the same program bench.py times: want_energy only on the last step
    step_full = sim._make_step_lazy(want_energy=True)
    step_fast = sim._make_step_lazy(want_energy=False)

    @jax.jit
    def blockfn(carry):
        carry, _ = jax.lax.scan(step_fast, carry, None, length=block - 1)
        carry, _ = step_full(carry, None)
        return carry

    carry = LazySimState(sim=sim.state, last_r=sim.state.r)
    t0 = time.time()
    lowered = blockfn.lower(carry)
    compiled = lowered.compile()
    print(f"compiled scan-{block} in {time.time()-t0:.1f}s", flush=True)

    # ---- compiler cost model ----
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    except Exception as e:  # relay backends may not implement it
        ca = None
        print(f"cost_analysis unavailable: {e}")
    if ca:
        flops = ca.get("flops", 0.0)
        trans = ca.get("transcendentals", 0.0)
        byts = ca.get("bytes accessed", 0.0)
        print(f"[cost] per {block}-step block: flops={flops:.4g} "
              f"transcendentals={trans:.4g} bytes={byts:.4g}")
        print(f"[cost] per step: flops={flops/block:.4g} "
              f"trans={trans/block:.4g} bytes={byts/block:.4g}")
        # slot-pair model: 2 passes (EAM) or 1 (LJ) x B x A x 27A
        g = sim.geom.grid
        B = g[0] * g[1] * g[2]
        A = sim.cfg.max_atoms
        passes = 2 if doeam else 1
        pairs = passes * B * A * 27 * A
        print(f"[model] candidate slot-pairs/step = {pairs:.4g} "
              f"({passes} sweep passes x {B} cells x {A} x 27*{A})")
        print(f"[model] compiler flops/slot-pair = {flops/block/pairs:.1f} "
              f"(+{trans/block/pairs:.2f} transcendental)")
        # VPU issue slots: one FMA = 2 flops
        t_floor_ms = flops / block / (2 * VPU_FMA_PER_S) * 1e3
        print(f"[model] flop floor at {VPU_FMA_PER_S:.3g} FMA/s = "
              f"{t_floor_ms:.2f} ms/step")
        if measured_ms > 0:
            print(f"[model] measured {measured_ms:.2f} ms/step -> "
                  f"achieved {flops/block/(measured_ms*1e-3):.4g} flop/s = "
                  f"{flops/block/(measured_ms*1e-3)/(2*VPU_FMA_PER_S)*100:.0f}"
                  f"% of VPU FMA ceiling")
            print(f"[model] residual over flop floor: "
                  f"{measured_ms - t_floor_ms:.2f} ms/step "
                  f"({(measured_ms-t_floor_ms)/measured_ms*100:.0f}%)")
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            print(f"[mem] {ma}")
    except Exception as e:
        print(f"memory_analysis unavailable: {e}")

    # ---- optimized HLO census ----
    try:
        txt = compiled.as_text()
    except Exception as e:
        print(f"as_text unavailable: {e}")
        return
    ops = re.findall(r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ ([\w-]+)\(", txt,
                     re.M)
    from collections import Counter
    census = Counter(ops)
    print("[hlo] top ops:", census.most_common(12))
    # largest fusion computations by line count (proxy for body size)
    fus = re.findall(r"^%?(fused_computation[\w.]*)", txt, re.M)
    sizes = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^%?(fused_computation[\w.]*)", line)
        if m:
            cur = m.group(1)
            sizes[cur] = 0
        elif cur is not None:
            if line.startswith("}"):
                cur = None
            else:
                sizes[cur] = sizes.get(cur, 0) + 1
    big = sorted(sizes.items(), key=lambda kv: -kv[1])[:8]
    print(f"[hlo] {len(sizes)} fused computations; largest bodies (lines):")
    for name, n in big:
        print(f"    {n:6d}  {name}")
    out = f"/tmp/step_attr_{nx}_{'eam' if doeam else 'lj'}.hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"[hlo] full text -> {out} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
