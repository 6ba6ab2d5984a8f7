#!/usr/bin/env bash
# Baker Mandarin recipe (TPU). Mirrors the reference stage pipeline
# (examples/baker/run.sh:24-107): data prep -> train -> infer -> export ->
# streaming check, with torchrun/ONNX replaced by the TPU-native entries.

set -e
stage=0
stop_stage=4

dir=exp/v1
config=configs/v1.json
raw_data_dir=.   # path to the DataBaker corpus
data=data
test_audio=test_audio
train_args=""     # extra train flags, e.g. "--max_steps 2" for smoke runs
val_size=100
test_size=10

. ../../tools/parse_options.sh || exit 1

repo_root=$(cd ../..; pwd)
export PYTHONPATH=$repo_root:$PYTHONPATH

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  mkdir -p $data
  python $repo_root/tools/gen_pinyin_lexicon.py \
    --with-zero-initial --with-tone --with-r \
    $data/lexicon.txt $data/phones.list
  python local/prepare_data.py \
    $data/lexicon.txt \
    $raw_data_dir/ProsodyLabeling/000001-010000.txt \
    $raw_data_dir/Wave > $data/all.txt

  awk -F '|' '{print $2}' $data/all.txt | sort | uniq | \
    awk '{print $0, NR-1}' > $data/speaker.txt
  echo 'sil 0' > $data/phones.txt
  awk -F '|' '{print $3}' $data/all.txt | \
    awk '{for (i=1;i<=NF;i++) print $i}' | sort | uniq | \
    grep -v 'sil' | awk '{print $0, NR}' >> $data/phones.txt

  shuf --random-source=<(yes 777) $data/all.txt > $data/train.txt
  head -n $val_size $data/train.txt > $data/val.txt
  sed -i "1,${val_size}d" $data/train.txt
  head -n $test_size $data/train.txt > $data/test.txt
  sed -i "1,${test_size}d" $data/train.txt
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  python -m wetts_tpu.bin.train_vits -c $config -m $dir \
    --train_data $data/train.txt \
    --val_data $data/val.txt \
    --speaker_table $data/speaker.txt \
    --phone_table $data/phones.txt $train_args
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  mkdir -p $test_audio
  python -m wetts_tpu.bin.infer_vits --cfg $config \
    --speaker_table $data/speaker.txt \
    --phone_table $data/phones.txt \
    --model_dir $dir \
    --test_file $data/test.txt \
    --outdir $test_audio
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  python -m wetts_tpu.bin.export_bundle --cfg $config \
    --speaker_table $data/speaker.txt \
    --phone_table $data/phones.txt \
    --model_dir $dir \
    --out_dir $dir/bundle
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  # quality gate: mel-cepstral distortion (DTW-aligned, c0-excluded) of
  # the synthesized test set against the corpus recordings — the runnable
  # replacement for the reference's listen-only check
  # (reference examples/baker/run.sh:83-88)
  python -m wetts_tpu.bin.eval_mcd \
    --test_file $data/test.txt \
    --gen_dir $test_audio | tee $dir/mcd.json
fi
