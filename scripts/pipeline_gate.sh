#!/usr/bin/env bash
# Pipeline-operator scale gate: bench the LLM-data-pipeline queries at
# three decades (sf0.1 -> sf1 -> sf10) so the curation/dedup/vector ops —
# the 100 TB-relevant surface — carry the same measured scaling evidence
# as the graph-algorithm gate (scale/SCALE_GATE.md).
#
# Usage: scripts/pipeline_gate.sh  (run from /root/repo; needs
#        target/scale/sf1 and target/scale/sf10 from graft.tools.ScaleUp)
# Output: scale/bench_pipeline_{sf01,sf1,sf10}.json
set -euo pipefail

QUERIES=(
  q_dedup_exact q_minhash_exactdup q_neardup_verified q_word_jaccard
  q_embed_neardup q_embed_batchdup q_semdedup q_para_dedup q_substr_spans
  q_rep_rules q_decontaminate q_fingerprint
  q_langid q_text_quality q_gopher_rules q_pii_redact
  q_tfidf q_bm25 q_doc_stats q_vocab_topk q_source_mix
  q_seq_packing_sharded q_split q_sample_exact
  q_embed_cluster q_knn_brute q_knn_lsh q_knn_ivf q_knn_hnsw
)

JAVA_OPTS=(--add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED)

run() { # $1 = sf dir, $2 = output tag
  echo "== pipeline gate: $1 -> scale/bench_pipeline_$2.json"
  sleep 30 # let the previous leg's JVM/page-cache churn settle
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
    java -Xmx40g "${JAVA_OPTS[@]}" \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench "${QUERIES[@]}" 2>/dev/null | tail -1 >/dev/null
  cp /tmp/graft_bench.json "scale/bench_pipeline_$2.json"
}

run /root/testdata/sf0.1 sf01
run target/scale/sf1 sf1
run target/scale/sf10 sf10
echo "== ratio analysis =="
python3 scripts/scale_gate.py scale/bench_pipeline_sf01.json scale/bench_pipeline_sf1.json
python3 scripts/scale_gate.py scale/bench_pipeline_sf1.json scale/bench_pipeline_sf10.json
