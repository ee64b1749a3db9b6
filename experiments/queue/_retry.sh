#!/bin/bash
# usage: _retry.sh <outfile> <marker> <tries> <timeout> cmd...
out=$1; marker=$2; tries=$3; to=$4; shift 4
for i in $(seq 1 $tries); do
  timeout $to "$@" > "$out" 2>&1
  if grep -q "$marker" "$out"; then echo "OK after try $i"; exit 0; fi
  echo "try $i failed; sleeping 90s"; sleep 90
done
echo "ALL $tries TRIES FAILED"; exit 1
