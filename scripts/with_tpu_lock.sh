#!/bin/bash
# Serialize TPU/CPU-heavy jobs against the driver's bench run (VERDICT r3
# missing #1: a leftover campaign held the single TPU chip and the host's
# one CPU core through the driver's capture window, turning the round's
# artifacts into rc=124 timeouts).
#
# Protocol: every long-running job goes through this wrapper. It takes an
# exclusive flock on /tmp/vidu4d_tpu.lock and records the job's pid in
# /tmp/vidu4d_campaign.pid. bench.py, when it cannot take the lock, kills
# the RECORDED pid (never by pattern) and proceeds — the driver's bench
# always wins the chip.
#
# exec keeps the same pid and inherits fd 9, so the pidfile names the real
# job process and the lock is released exactly when the job dies.
exec 9>/tmp/vidu4d_tpu.lock
flock 9
echo $$ > /tmp/vidu4d_campaign.pid
exec "$@"
