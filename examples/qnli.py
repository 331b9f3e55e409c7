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
    """Random-weight encrypted-vs-plaintext agreement check: the same
    random weights run through torch (plaintext) and through the encrypted
    curl_tpu model; argmax must agree on every example."""
    import torch
    from transformers import BertConfig, BertForSequenceClassification

    import curl_tpu
    from curl_tpu.models.bert_classifier import BertTinyForSequenceClassification

    curl_tpu.init(world_size=2, seed=71)
    torch.manual_seed(3)
    hf = BertForSequenceClassification(
        BertConfig(vocab_size=30522, hidden_size=128, num_hidden_layers=2,
                   num_attention_heads=2, intermediate_size=512, num_labels=2)
    )
    hf.eval()
    model = BertTinyForSequenceClassification(seq_len=seq_len)
    model.load_hf_state_dict(hf.state_dict())
    model.encrypt(src=0)

    rows = load_tsv(QNLI_TSV, count)
    agree = 0
    for q, s, y in rows:
        ids, types = hash_tokenize(q, s, seq_len)
        with torch.no_grad():
            plain = int(
                hf(input_ids=torch.tensor(ids, dtype=torch.long),
                   token_type_ids=torch.tensor(types, dtype=torch.long))
                .logits.argmax()
            )
        out = model(
            curl_tpu.cryptensor(ids, precision=0),
            curl_tpu.cryptensor(types, precision=0),
        )
        enc_pred = int(out.get_plain_text().argmax())
        agree += enc_pred == plain
        print(f"label={y} plaintext_pred={plain} encrypted_pred={enc_pred}")
    print(f"argmax agreement: {agree}/{len(rows)}")


def run_accuracy(model_path, count, model_size="BertTiny", seq_len=64, chunk=25):
    """Reference report format (examples/llms/qnli.py:54-70): plaintext
    torch accuracy vs encrypted accuracy on the same QNLI dev rows.

    The encrypted pass is batched (one eager protocol pass per `chunk`
    examples) — per-op dispatch cost is shape-cached, so batching is the
    difference between minutes and hours on this surface."""
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
    enc_batch = tok([q for q, _, _ in rows], [s for _, s, _ in rows],
                    return_tensors="pt", truncation=True,
                    max_length=seq_len, padding="max_length")
    labels = np.array([y for _, _, y in rows])
    with torch.no_grad():
        plain_preds = hf(**enc_batch).logits.argmax(-1).numpy()

    ids = enc_batch["input_ids"].double().numpy()
    types = enc_batch["token_type_ids"].double().numpy()
    enc_preds = []
    for i in range(0, len(rows), chunk):
        out = enc_model(
            curl_tpu.cryptensor(ids[i:i + chunk], precision=0),
            curl_tpu.cryptensor(types[i:i + chunk], precision=0),
        )
        enc_preds.append(out.get_plain_text().argmax(-1))
        print(f"# encrypted {min(i + chunk, len(rows))}/{len(rows)}")
    enc_preds = np.concatenate(enc_preds)

    total = len(rows)
    plain_acc = (plain_preds == labels).mean()
    enc_acc = (enc_preds == labels).mean()
    agree = (enc_preds == plain_preds).mean()
    print(f"plaintext accuracy: {plain_acc:.3f}  encrypted accuracy: "
          f"{enc_acc:.3f}  (argmax agreement {agree:.3f}, n={total})")


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
