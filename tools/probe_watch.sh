#!/bin/bash
# Poll cpu_probe every ~90s; append to /tmp/probe_log.jsonl
for i in $(seq 1 240); do
  ts=$(date +%s)
  out=$(python /root/repo/tools/cpu_probe.py 2>/dev/null)
  echo "{\"ts\": $ts, \"probe\": $out}" >> /tmp/probe_log.jsonl
  sleep 80
done
