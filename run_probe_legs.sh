#!/bin/bash
# r15 probe scale legs (VERDICT items 1-2). Phase 1 builds the four
# persisted histories (concurrent, untimed). Phase 2 runs the timed
# probe A/Bs SEQUENTIALLY on a quiet host: per op, arms interleaved
# fused/composite/ckpt on IDENTICAL history (fresh copy per arm).
# near_dup reuses /root/nd_ab_wh via bench_nd_cap_ab-compatible
# tables. Usage: run_probe_legs.sh {build|probe|probe8}
set -u
cd /root/repo
mkdir -p /root/probe_wh bench_out

case "$1" in
build)
  # 8 epochs x 250k = 2M docs per op (funnel: heavier per epoch, same
  # total). Concurrent at 16 cores each: untimed, wall-clock matters.
  ( python bench_probe_scale.py --op wide_fp --build 8 250000 --cpus 16 \
      > bench_out/build_wide_fp.json 2> bench_out/build_wide_fp.err ) &
  ( python bench_probe_scale.py --op phash --build 8 250000 --cpus 16 \
      > bench_out/build_phash.json 2> bench_out/build_phash.err ) &
  wait
  ( python bench_probe_scale.py --op ann --build 8 250000 --cpus 16 \
      > bench_out/build_ann.json 2> bench_out/build_ann.err ) &
  ( python bench_probe_scale.py --op funnel --build 8 250000 --cpus 16 \
      > bench_out/build_funnel.json 2> bench_out/build_funnel.err ) &
  wait
  echo BUILDS_DONE
  ;;
probe)
  # timed: sequential, fresh wh copy per arm so history is identical
  for op in near_dup ann phash wide_fp funnel; do
    src=/root/probe_wh/${op}
    [ "$op" = near_dup ] && src=/root/nd_ab_wh
    for arm in fused composite ckpt; do
      rm -rf /root/probe_wh/${op}_run
      cp -r $src /root/probe_wh/${op}_run
      python bench_probe_scale.py --op $op --probe 4 --arm $arm \
        --wh /root/probe_wh/${op}_run --cpus 32 \
        > bench_out/probe_${op}_${arm}.json \
        2> bench_out/probe_${op}_${arm}.err
      tail -1 bench_out/probe_${op}_${arm}.json
    done
  done
  echo PROBES_DONE
  ;;
probe8)
  # saturation leg (8 cores): the nd_cand duplicate-subtree decision
  for op in "$@"; do
    [ "$op" = probe8 ] && continue
    src=/root/probe_wh/${op}
    [ "$op" = near_dup ] && src=/root/nd_ab_wh
    for arm in fused ckpt; do
      rm -rf /root/probe_wh/${op}_run
      cp -r $src /root/probe_wh/${op}_run
      python bench_probe_scale.py --op $op --probe 4 --arm $arm \
        --wh /root/probe_wh/${op}_run --cpus 8 \
        > bench_out/probe8_${op}_${arm}.json \
        2> bench_out/probe8_${op}_${arm}.err
      tail -1 bench_out/probe8_${op}_${arm}.json
    done
  done
  echo PROBE8_DONE
  ;;
esac
