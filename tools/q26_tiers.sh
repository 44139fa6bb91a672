#!/bin/bash
# q26 scaling attribution: run the SessionizeEconomics decomposition
# (sort skeleton / +windows / full query, min-of-3 warm) at base and at
# the 10x/32x/64x fixtures of sf0.1, fresh JVM per tier.
set -e
cd /root/repo
for f in 10 32 64; do
  if ! ls -d /tmp/graft-scale-*-x$f >/dev/null 2>&1; then
    echo "== building x$f fixture =="
    sbt -batch "runMain graft.ScaleFixture /root/testdata/sf0.1 $f" 2>&1 | tail -2
  fi
done
echo "== base sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.SessionizeEconomics 3" 2>&1 | grep "Q26E"
for f in 10 32 64; do
  d=$(ls -d /tmp/graft-scale-*-x$f | head -1)
  echo "== tier x$f ($d) =="
  SPARK_GRAFT_SF_DIR=$d SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.SessionizeEconomics 3" 2>&1 | grep "Q26E"
done
echo "== q26 tiers done =="
