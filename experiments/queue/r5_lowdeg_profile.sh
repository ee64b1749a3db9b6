#!/bin/bash
# Round-5: locate low-degree time (p=2 r8 compact vs flat; p=1 r8 plain)
cd /root/repo
mkdir -p results/queue_raw
timeout 1800 python experiments/profile_vmult.py 8 2 40 > results/queue_raw/r5_prof_p2_compact.out 2>&1
echo "=== p2 compact rc=$?"
BRICK_CHAIN=flat timeout 1800 python experiments/profile_vmult.py 8 2 40 > results/queue_raw/r5_prof_p2_flat.out 2>&1
echo "=== p2 flat rc=$?"
timeout 1800 python experiments/profile_vmult.py 8 1 40 > results/queue_raw/r5_prof_p1.out 2>&1
echo "=== p1 rc=$?"
