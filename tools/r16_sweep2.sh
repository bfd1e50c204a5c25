#!/bin/bash
# Round-16 measurement sweep, part 2 (post native-encode + v3 fixture):
# the stages killed from part 1, with the scan knob where embeddings
# dominate. Verify/bench/sf fixtures already done in part 1.
set -x
cd /root/repo
R=/tmp/r16
mkdir -p $R

# clustered fixture at v3 (stamp mismatch -> regenerate)
SPARK_DRIVER_MEM=24g sbt -batch 'runMain graft.GenClustered /tmp/clustered20k 20000' > $R/genclu_v3.log 2>&1

# recall curve + codebook/residual axis (knob: clustered file is ~5 MB)
SPARK_DRIVER_MEM=24g SPARK_GRAFT_MAX_PARTITION_BYTES=262144 \
  sbt -batch 'runMain graft.BenchRecall /tmp/clustered20k 1,3,5 100' > $R/recall.log 2>&1

# lifecycle pricing at sf1: refresh frac, compact, REBUILD
SPARK_DRIVER_MEM=24g SPARK_GRAFT_MAX_PARTITION_BYTES=262144 \
  sbt -batch 'runMain graft.BenchRefresh /tmp/sf1 0.1,compact,rebuild' > $R/refresh_sf1.log 2>&1

# lineitem-axis decade re-runs (NO knob - multi-GB lineitem scans)
SPARK_DRIVER_MEM=48g sbt -batch 'runMain graft.BenchSet q94_approx_percentiles,q82_gapfill /tmp/sf1,/tmp/sf10 2' > $R/lineitem_anchors.log 2>&1

# embeddings anchors WITH the scan-parallelism knob
SPARK_DRIVER_MEM=48g SPARK_GRAFT_MAX_PARTITION_BYTES=262144 \
  sbt -batch 'runMain graft.BenchSet q125_pq_encode,q40_embed_ivf,q302_embed_ivf_sqrt,q323_ivf_sampled_train,q252_silhouette /tmp/sf1,/tmp/sf10 2' > $R/emb_anchors.log 2>&1

# new lifecycle queries, sf1 leg
SPARK_DRIVER_MEM=48g SPARK_GRAFT_MAX_PARTITION_BYTES=262144 \
  sbt -batch 'runMain graft.BenchSet q334_pq_hires_adc_serve,q337_pq_residual_adc_serve,q335_rebuild_serve,q336_rebuild_pairs_serve /tmp/sf1 2' > $R/lifecycle_sf1.log 2>&1

# rebuild pricing at sf10 (one full build's work on 200k vectors)
SPARK_DRIVER_MEM=48g SPARK_GRAFT_MAX_PARTITION_BYTES=262144 \
  sbt -batch 'runMain graft.BenchRefresh /tmp/sf10 0.1,rebuild' > $R/refresh_sf10.log 2>&1

# hi-res + residual encode cost at sf10 (now codegen'd - one real decade leg)
SPARK_DRIVER_MEM=48g SPARK_GRAFT_MAX_PARTITION_BYTES=262144 \
  sbt -batch 'runMain graft.BenchSet q334_pq_hires_adc_serve,q337_pq_residual_adc_serve /tmp/sf10 2' > $R/lifecycle_sf10.log 2>&1

echo ALLDONE > $R/DONE
