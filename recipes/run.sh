#!/usr/bin/env bash
# Canonical launch recipes, mirroring the reference run.sh hyperparameters
# (bert-base-uncased, q_max 32, p_max 156, lr 1e-5, topk 5,10,20,50,100,
# retrieve_num 100, Tevatron/wikipedia-nq + xxazz/nq-corpus).
#
# No torch.distributed.launch: one process drives all local TPU chips through
# the mesh (--dp_size/--tp_size); multi-host slices initialize
# jax.distributed and run the same script per host.
set -euo pipefail

CACHE=${DRT_CACHE:-./drt_cache}

# ---- 1. DPR + random negatives on NQ (from an HF checkpoint) ---------------
run_random_sampling() {
python3 run_random_sampling.py \
    --model_name_or_path bert-base-uncased \
    --untie_encoder \
    --dataset nq \
    --dataset_name Tevatron/wikipedia-nq \
    --corpus_name xxazz/nq-corpus \
    --data_cache_dir "$CACHE" \
    --cache_train_dir "$CACHE" \
    --output_dir ./model_nq \
    --train_batch_size 16 --eval_batch_size 16 --test_batch_size 32 \
    --corpus_batch_size 16 \
    --train_n_passages 2 --positive_passage_no_shuffle \
    --learning_rate 1e-5 --max_epochs 40 \
    --q_max_len 32 --p_max_len 156 \
    --topk 5,10,20,50,100 --retrieve_num 100 \
    --eval_per_train 40 --save_per_train 10 \
    --index_dtype bfloat16
}

# ---- 2. resume the same run from a saved checkpoint -------------------------
run_random_sampling_resume() {
python3 run_random_sampling.py \
    --model_name_or_path "$CACHE/result30" \
    --tokenizer_name bert-base-uncased \
    --dataset nq \
    --dataset_name Tevatron/wikipedia-nq \
    --corpus_name xxazz/nq-corpus \
    --data_cache_dir "$CACHE" --cache_train_dir "$CACHE" \
    --output_dir ./model_nq \
    --train_batch_size 16 --eval_batch_size 16 --test_batch_size 32 \
    --corpus_batch_size 16 \
    --train_n_passages 2 --positive_passage_no_shuffle \
    --learning_rate 1e-5 --max_epochs 30 \
    --q_max_len 32 --p_max_len 156 \
    --topk 5,10,20,50,100 --retrieve_num 100 \
    --eval_per_train 30 --save_per_train 10
}

# ---- 3. DPR + BM25 hard negatives (train_n_passages 8) ----------------------
run_bm25() {
python3 run_BM25_negative.py \
    --model_name_or_path bert-base-uncased \
    --dataset nq \
    --dataset_name Tevatron/wikipedia-nq \
    --corpus_name xxazz/nq-corpus \
    --data_cache_dir "$CACHE" --cache_train_dir "$CACHE" \
    --output_dir ./model_nq_bm25 \
    --train_batch_size 16 --eval_batch_size 16 --test_batch_size 32 \
    --corpus_batch_size 16 \
    --train_n_passages 8 \
    --learning_rate 1e-5 --max_epochs 40 \
    --q_max_len 32 --p_max_len 156 \
    --topk 5,10,20,50,100 --retrieve_num 100 \
    --eval_per_train 40 --save_per_train 10
}

# ---- 4. cross-encoder reranker over the dense retriever's dump --------------
run_reranker() {
python3 run_reranker.py \
    --model_name_or_path bert-base-uncased \
    --dataset nq \
    --dataset_name Tevatron/wikipedia-nq \
    --data_cache_dir "$CACHE" --cache_train_dir "$CACHE" \
    --output_dir ./model_nq_rr \
    --train_batch_size 16 --eval_batch_size 32 \
    --train_n_passages 8 \
    --learning_rate 1e-5 --max_epochs 3 \
    --q_max_len 32 --p_max_len 156 \
    --topk 5,10,20,50,100 --retrieve_num 100 \
    --loss_fn mr --margin 1.0
}

# ---- 5. dense-mined negatives (ANCE-style refresh; replaces offline BM25) ---
run_dense_mining() {
python3 run_random_sampling.py \
    --model_name_or_path bert-base-uncased \
    --dataset nq \
    --dataset_name Tevatron/wikipedia-nq \
    --corpus_name xxazz/nq-corpus \
    --data_cache_dir "$CACHE" --cache_train_dir "$CACHE" \
    --output_dir ./model_nq_mined \
    --train_batch_size 16 --eval_batch_size 16 --test_batch_size 32 \
    --corpus_batch_size 16 \
    --train_n_passages 8 \
    --learning_rate 1e-5 --max_epochs 40 \
    --q_max_len 32 --p_max_len 156 \
    --topk 5,10,20,50,100 --retrieve_num 100 \
    --eval_per_train 10 --save_per_train 10 \
    --mine_per_train 10 \
    --index_dtype int8
}

# ---- 6. offline encode + retrieval (the reference's missing run_toolkits path)
run_offline_retrieval() {
python3 run_encode.py \
    --model_name_or_path "$CACHE/result30" \
    --tokenizer_name bert-base-uncased \
    --encode_in_path corpus.jsonl \
    --encodedp_save_path corpus_emb.pkl \
    --p_max_len 156 --corpus_batch_size 128
python3 run_encode.py \
    --model_name_or_path "$CACHE/result30" \
    --tokenizer_name bert-base-uncased \
    --encode_in_path queries.jsonl --encode_is_qry \
    --encodedq_save_path query_emb.pkl \
    --q_max_len 32
python3 -m denseretrievaltoolkits_tpu.evaluator.retrieval \
    --query_reps query_emb.pkl \
    --passage_reps 'corpus_emb*.pkl' \
    --depth 100 --save_text \
    --save_ranking_to run.nq.txt
}

# Trained-ANN evaluation index: the factory string is trained on the encoded
# corpus during evaluation (reference faiss.index_factory + train(),
# DRT/evaluator/index.py:47-54). IVF cells are int8; search_mode=serve probes
# nprobe cells per query via the cell-major bulk kernel.
run_random_sampling_ivf() {
python3 run_random_sampling.py \
    --model_name_or_path bert-base-uncased \
    --untie_encoder \
    --dataset nq \
    --dataset_name Tevatron/wikipedia-nq \
    --corpus_name xxazz/nq-corpus \
    --data_cache_dir "$CACHE" \
    --cache_train_dir "$CACHE" \
    --output_dir ./model_nq_ivf \
    --train_batch_size 16 --eval_batch_size 16 --test_batch_size 32 \
    --corpus_batch_size 16 \
    --train_n_passages 2 --positive_passage_no_shuffle \
    --learning_rate 1e-5 --max_epochs 40 \
    --q_max_len 32 --p_max_len 156 \
    --topk 5,10,20,50,100 --retrieve_num 100 \
    --eval_per_train 40 --save_per_train 10 \
    --index_factory IVF4096,SQ8 --nprobe 32 \
    --search_mode serve
}

"${1:-run_random_sampling}"
