#!/bin/bash
# Serialize ALL TPU access behind one exclusive lock (one TPU process at a
# time — concurrent sessions wedge the relay), wait until the TPU answers a
# trivial op, then run the given command WHILE STILL HOLDING the lock.
LOCK=${BENCH_LOCK_PATH:-/tmp/comd_tpu.lock}
PRIO=${BENCH_PRIORITY_PATH:-/tmp/comd_tpu.driver_priority}

# Yield to the driver's bench.py: it touches $PRIO on entry and removes it
# on exit.  Campaign runs wait here BEFORE queueing for the lock, so bench
# (which takes a blocking flock) wins the lock the moment the current
# holder finishes — back-to-back campaign batches can no longer starve it
# (the round-4 BENCH=0.0 failure mode).  Stale flags (>40 min — bench's
# whole budget is 20 min) are cleaned up so a crashed bench can't wedge
# the campaign.
while [ -e "$PRIO" ]; do
  if [ -n "$(find "$PRIO" -mmin +40 2>/dev/null)" ]; then
    echo "[gate] stale driver-priority flag, removing" >&2
    rm -f "$PRIO"
    break
  fi
  echo "[gate] driver-priority flag present, yielding 15s..." >&2
  sleep 15
done

exec 9>"$LOCK"
flock 9
# GATE_ATTEMPTS tunes how long the lock is held while the TPU is down
# (probe watchers use a small value so other waiters get a turn).
# GATE_PROBE_S must cover a COLD relay dial (183s measured round 5; warm
# ~10s) -- a 90s probe kills every cold dial and misreads a working chip
# as down forever.
for i in $(seq 1 "${GATE_ATTEMPTS:-20}"); do
  # -k 5: a probe wedged in native relay code can ignore SIGTERM; without
  # the SIGKILL escalation the gate would hang here holding the global lock
  if timeout -k 5 "${GATE_PROBE_S:-330}" python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); assert float((x@x)[0,0]) == 128.0
print('TPU healthy')" 2>/dev/null | grep -q healthy; then
    exec "$@"
  fi
  echo "[gate] TPU not responding (attempt $i), waiting 30s..." >&2
  sleep 30
done
echo "[gate] giving up" >&2
exit 1
