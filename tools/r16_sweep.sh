#!/bin/bash
# Round-16 measurement sweep: sequential (one sbt at a time), essentials
# first so a partial run still yields the round's core artifacts.
set -x
cd /root/repo
R=/tmp/r16
mkdir -p $R

# 1. full Verify at the driver's gate scale + DuckDB compare (337 queries)
sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify_r16full' > $R/verify.log 2>&1
python3 tools/local_verify.py /tmp/graft_verify_r16full /root/testdata/sf0.01 > $R/verify_cmp.log 2>&1
echo "verify_rc=$?" >> $R/verify_cmp.log

# 2. full battery bench at the driver's scale, new streamed format
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch 'runMain graft.Bench' > $R/bench_sf01.log 2>&1

# 3. scale fixtures
SPARK_DRIVER_MEM=24g sbt -batch 'runMain graft.GenScale /root/testdata/sf0.1 /tmp/sf1 10' > $R/gensf1.log 2>&1
SPARK_DRIVER_MEM=48g sbt -batch 'runMain graft.GenScale /root/testdata/sf0.1 /tmp/sf10 100' > $R/gensf10.log 2>&1
SPARK_DRIVER_MEM=24g sbt -batch 'runMain graft.GenClustered /tmp/clustered20k 20000' > $R/genclu.log 2>&1

# 4. recall curve + codebook/residual axis on the clustered fixture
SPARK_DRIVER_MEM=24g sbt -batch 'runMain graft.BenchRecall /tmp/clustered20k 1,3,5 100' > $R/recall.log 2>&1

# 5. lifecycle pricing at sf1: refresh frac, compact, REBUILD
SPARK_DRIVER_MEM=24g sbt -batch 'runMain graft.BenchRefresh /tmp/sf1 0.1,compact,rebuild' > $R/refresh_sf1.log 2>&1

# 6. lineitem-axis decade re-runs (host-taxed r15 numbers; NO scan knob -
#    a 256 KB split floor would fragment the multi-GB lineitem scans)
SPARK_DRIVER_MEM=48g sbt -batch 'runMain graft.BenchSet q94_approx_percentiles,q82_gapfill /tmp/sf1,/tmp/sf10 2' > $R/lineitem_anchors.log 2>&1

# 7. embeddings anchors WITH the scan-parallelism knob (the round-15
#    jstack finding: 7.4 MB dictionary-encoded file -> 2 scan tasks)
SPARK_DRIVER_MEM=48g SPARK_GRAFT_MAX_PARTITION_BYTES=262144 \
  sbt -batch 'runMain graft.BenchSet q125_pq_encode,q40_embed_ivf,q302_embed_ivf_sqrt,q323_ivf_sampled_train,q252_silhouette /tmp/sf1,/tmp/sf10 2' > $R/emb_anchors.log 2>&1

# 8. new lifecycle queries at sf1 (one real decade leg; sf10 encode cost
#    is q125's family at 16x codeword-pairs - predicted, not measured)
SPARK_DRIVER_MEM=48g SPARK_GRAFT_MAX_PARTITION_BYTES=262144 \
  sbt -batch 'runMain graft.BenchSet q334_pq_hires_adc_serve,q337_pq_residual_adc_serve,q335_rebuild_serve,q336_rebuild_pairs_serve /tmp/sf1 2' > $R/lifecycle_sf1.log 2>&1

# 9. rebuild pricing at sf10 (one full build's work on 200k vectors)
SPARK_DRIVER_MEM=48g SPARK_GRAFT_MAX_PARTITION_BYTES=262144 \
  sbt -batch 'runMain graft.BenchRefresh /tmp/sf10 0.1,rebuild' > $R/refresh_sf10.log 2>&1

echo ALLDONE > $R/DONE
