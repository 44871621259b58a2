"""End-to-end CLI runs (subprocess) and the driver entry contract."""
import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=8")


def run_cli(*args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "comd_tpu.cli", *args],
        capture_output=True, text=True, cwd=REPO, env=ENV, timeout=timeout)


def test_cli_lj_run():
    out = run_cli("-x", "4", "-y", "4", "-z", "4", "-N", "4", "-n", "2",
                  "--maxAtoms", "48", "--boxChunk", "16")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "no atoms lost" in out.stdout
    assert "eFinal/eInitial" in out.stdout
    assert "Average atom rate" in out.stdout


def test_cli_timer_report_has_real_rows():
    """A plain run's timer report must carry nonzero rows beyond
    total/loop/timestep: the init dispatches (redistribute/atomHalo/force)
    and the per-block reductions (commReduce) are real, separately
    dispatched work (the reference fills these rows every run,
    performanceTimers.c:127-194)."""
    out = run_cli("-x", "4", "-y", "4", "-z", "4", "-N", "4", "-n", "2",
                  "--maxAtoms", "48", "--boxChunk", "16")
    assert out.returncode == 0, out.stderr[-2000:]
    for row in ("redistribute", "atomHalo", "force", "commReduce"):
        m = re.search(rf"^\s*{row}\s+(\d+)\s", out.stdout, re.M)
        assert m and int(m.group(1)) > 0, f"timer row {row} missing/zero"


def test_cli_yaml_report(tmp_path):
    out = run_cli("-x", "4", "-y", "4", "-z", "4", "-N", "2", "-n", "2",
                  "--maxAtoms", "48", "--boxChunk", "16",
                  "--yaml", str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    files = list(tmp_path.glob("*.yaml"))
    assert len(files) == 1
    text = files[0].read_text()
    assert "Decomposition data" in text and "Potential data" in text


def test_cli_bad_method_clean_error():
    out = run_cli("-m", "nonsense")
    assert out.returncode == 1
    assert "Fatal Error" in out.stderr
    assert "Traceback" not in out.stderr


def test_graft_entry_single_chip():
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; import jax; "
         "fn, args = g.entry(); s = jax.jit(fn)(*args); "
         "print('OK', float(s.e_potential))"],
        capture_output=True, text=True, cwd=REPO, env=ENV, timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_graft_dryrun_multichip():
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        capture_output=True, text=True, cwd=REPO, env=ENV, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_bench_pipeline_emits_json():
    """The driver benchmark's whole parent->child->JSON pipeline must work:
    probe, measurement child, rate computation, and the single JSON line on
    stdout (round-3's lost artifacts were a harness bug, not a perf bug --
    this guards the harness itself, on CPU with a tiny config)."""
    env = dict(ENV, BENCH_CELLS="8", BENCH_SHORT="1", BENCH_LONG="2",
               BENCH_BUDGET_S="500")
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        cwd=REPO, env=env, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "atom-steps/sec/chip"
    assert rec["value"] > 0, (rec, out.stderr[-2000:])
    assert "bench failed" not in rec["metric"]


def test_bench_lock_not_starved_by_campaign(tmp_path):
    """Round-4 failure mode: bench.py polled the TPU lock non-blocking every
    20s while back-to-back gated campaign runs re-grabbed it first -- the
    official perf record got 0.0.  The round-5 protocol: bench touches a
    driver-priority flag (campaign gates yield to it) and takes a QUEUED
    blocking flock.  Rehearse the full protocol on CPU: a campaign emulator
    cycles hold-5s/release, honoring the flag exactly like tpu_gate.sh; bench
    must land a real rate well inside its budget."""
    lock = str(tmp_path / "tpu.lock")
    prio = str(tmp_path / "driver_priority")
    # Campaign emulator: same yield-then-flock protocol as tools/tpu_gate.sh,
    # cycling forever until killed.
    emulator = f"""
while true; do
  while [ -e "{prio}" ]; do sleep 0.5; done
  ( flock 9; sleep 5 ) 9>"{lock}"
  sleep 0.2
done
"""
    camp = subprocess.Popen(["bash", "-c", emulator],
                            start_new_session=True)
    try:
        import time
        time.sleep(1.0)   # let the emulator grab the lock first
        env = dict(ENV, BENCH_CELLS="8", BENCH_SHORT="1", BENCH_LONG="2",
                   BENCH_BUDGET_S="500", BENCH_FORCE_LOCK="1",
                   BENCH_LOCK_PATH=lock, BENCH_PRIORITY_PATH=prio)
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True,
            cwd=REPO, env=env, timeout=540)
        assert out.returncode == 0, out.stderr[-2000:]
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        assert rec["value"] > 0, (rec, out.stderr[-2000:])
        assert "bench failed" not in rec["metric"]
        assert "TPU lock acquired" in out.stderr
        # bench must clean up its priority flag so campaigns resume
        assert not os.path.exists(prio)
    finally:
        import signal as _sig
        os.killpg(camp.pid, _sig.SIGKILL)
        camp.wait()


def test_cli_checkpoint_restore_roundtrip(tmp_path):
    """--checkpoint writes a resumable state; --restore continues the
    trajectory (step numbering, conservation, atom count)."""
    ck = str(tmp_path / "ck")
    out = run_cli("-e", "-x", "4", "-y", "4", "-z", "4", "-N", "10",
                  "-n", "5", "--dtype", "float64", "--maxAtoms", "48",
                  "--checkpoint", ck)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "final checkpoint written" in out.stdout
    out2 = run_cli("-N", "4", "-n", "2", "--restore", ck)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "Restored checkpoint" in out2.stdout
    # -N on restore ADDS steps on top of the stored step (10 + 4 = 14),
    # overriding the checkpoint's stored n_steps
    assert " 14 " in out2.stdout.replace("     ", " ")
    assert " 20 " not in out2.stdout.replace("     ", " ")
    assert "no atoms lost" in out2.stdout


def test_cli_overflow_aborts_with_clear_error():
    """Capacity overflow (tiny --maxAtoms) must abort with an actionable
    message, not silently drop atoms (gpu_redistribute.h:152 asserts)."""
    out = run_cli("-x", "4", "-y", "4", "-z", "4", "-N", "4",
                  "--maxAtoms", "8", "--boxChunk", "16")
    assert out.returncode != 0
    text = out.stdout + out.stderr
    assert "capacity" in text and "max_atoms" in text
    assert "Fatal Error" in text
    assert "Traceback" not in text


def test_cli_impl_flags_map_to_config():
    """--sweepImpl/--interpImpl/--commImpl flow into Config verbatim."""
    from comd_tpu.cli import build_parser, config_from_args
    args = build_parser().parse_args(
        ["--sweepImpl", "dense_wf", "--interpImpl", "twolevel",
         "--commImpl", "ki"])
    cfg = config_from_args(args)
    assert cfg.sweep_impl == "dense_wf"
    assert cfg.resolved_sweep_impl == "dense_wf"
    assert cfg.interp_impl == "twolevel"
    assert cfg.comm_impl == "ki"
    # defaults stay auto/collective
    d = config_from_args(build_parser().parse_args([]))
    assert d.sweep_impl == "auto" and d.comm_impl == "collective"


def test_gpu_async_auto_default():
    """-a auto (-1): ON for the performance NL families (measured 10.5%
    EAM win, noise-neutral LJ -- docs/BENCHMARKS.md round 5) including
    the -L pairlist (same NL stepping machinery), OFF for cell sweeps
    (costs 8-15% single-chip) and for the cpu_nl oracle (keeps the
    plain force path as an independent reference); explicit -a 0/1
    always honored."""
    from comd_tpu.cli import build_parser, config_from_args
    from comd_tpu.config import Config

    d = config_from_args(build_parser().parse_args([]))
    assert d.gpu_async == -1 and d.resolved_gpu_async == 0

    nl = config_from_args(build_parser().parse_args(
        ["-m", "thread_atom_nl"]))
    assert nl.resolved_gpu_async == 1
    assert Config(method="warp_atom_nl").resolved_gpu_async == 1

    # -L runs the NL stepping machinery (ShardedSimulation.uses_nl), so
    # auto must resolve the same way it does for -m *_nl
    pl = config_from_args(build_parser().parse_args(["-L"]))
    assert pl.use_pairlist and pl.resolved_gpu_async == 1

    # the cpu_nl correctness oracle keeps the plain (unsplit) path
    assert Config(method="cpu_nl").resolved_gpu_async == 0
    assert Config(method="cpu_nl", gpu_async=1).resolved_gpu_async == 1

    # explicit values win over auto on both families
    assert Config(method="thread_atom_nl",
                  gpu_async=0).resolved_gpu_async == 0
    assert Config(method="thread_atom",
                  gpu_async=1).resolved_gpu_async == 1
