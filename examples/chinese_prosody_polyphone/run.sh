#!/usr/bin/env bash
# BERT frontend recipe: joint prosody+polyphone training + eval
# (mirrors examples/chinese_prosody_polyphone/run.sh:14-98).
# Data: polyphone (g2pM-style ▁-marker files) + prosody (biaobei rank files)
# under $data; a local Chinese BERT under $bert_dir.
set -e
stage=0
stop_stage=2
dir=exp/frontend
data=data
bert_dir=./bert-base-chinese
. ../../tools/parse_options.sh || exit 1
repo_root=$(cd ../..; pwd)
export PYTHONPATH=$repo_root:$PYTHONPATH

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  python -m wetts_tpu.bin.train_frontend \
    --model_dir $dir \
    --vocab $bert_dir/vocab.txt \
    --bert_dir $bert_dir \
    --polyphone_file $data/polyphone/train.txt \
    --polyphone_dict $data/lexicon/polyphone.txt \
    --prosody_file $data/prosody/train.txt \
    --cv_polyphone_file $data/polyphone/cv.txt \
    --cv_prosody_file $data/prosody/cv.txt \
    --epochs 10 --batch_size 32
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  python -m wetts_tpu.bin.eval_frontend \
    --model_dir $dir \
    --vocab $bert_dir/vocab.txt \
    --polyphone_file $data/polyphone/test.txt \
    --polyphone_dict $data/lexicon/polyphone.txt \
    --prosody_file $data/prosody/test.txt
fi
