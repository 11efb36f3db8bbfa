#!/bin/bash
# Epoch-health canary: converged (iters=4) mins of four throttle-sensitive
# small md5/text lanes, ~2.5 min wall. The box frequency-caps sustained
# ALU kernels in the evening/overnight; these lanes show it 2-3x while
# scans/joins stay flat. Reference points (2026-08-16/17, same code):
#   healthy 18:00-epoch in-suite sum ~1.36 s (the 205.9 committed close)
#   throttled 23:44 sum 2.90 / 00:15 sum 3.06 / 00:47 sum 4.12
# Gate a full close attempt on the converged sum: < 2.2 => worth the run.
# NOTE: /tmp/canary_out.json keeps the fastest-so-far (Bench slower-guard);
# read the CONVERGED mins from /tmp/canary.log, or treat the out-file as
# "fires only when the epoch beats everything seen" — both usable.
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ITERS=4
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_BENCH_OUT=/tmp/canary_out.json
export SPARK_GRAFT_BENCH_REF=/tmp/nonexistent.json
export SPARK_GRAFT_BENCH_QUERIES=q_dedup_simhash,q_fingerprint,q_doc_chunks,q_dedup_minhash
sbt -batch "runMain graft.Bench" > /tmp/canary.log 2>&1
grep -o '"value":[0-9.]*' /tmp/canary_out.json | head -1
