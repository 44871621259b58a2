#!/bin/bash
# Serialize ALL TPU access behind one exclusive lock (one TPU process at a
# time — concurrent sessions wedge the relay), wait until the TPU answers a
# trivial op, then run the given command WHILE STILL HOLDING the lock.
LOCK=/tmp/comd_tpu.lock
exec 9>"$LOCK"
flock 9
# GATE_ATTEMPTS tunes how long the lock is held while the TPU is down
# (probe watchers use a small value so other waiters get a turn).
for i in $(seq 1 "${GATE_ATTEMPTS:-20}"); do
  if timeout 90 python -c "
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
