#!/usr/bin/env python3
"""Train the shipped BPE merge table (src/main/resources/graft/bpe_merges.txt).

Classic Sennrich'16 BPE training: start from characters, repeatedly
merge the most frequent adjacent symbol pair (ties broken by the
lexicographically smallest (a, b) so the table is fully deterministic),
never merging across whitespace.

Training corpus: public English prose shipped with this container —
the common license texts (/usr/share/common-licenses), the Spark
LICENSE/NOTICE/README, and the Python 3.11 stdlib docstrings. Text is
lowercased and restricted to [a-z0-9 .,;:!?'()-] to match the engine's
lowercase test corpus; symbols therefore never contain whitespace,
which is the invariant q_text_tokens_bpe's one-pass-per-rule
application relies on (merges cannot cross token boundaries).

Run: python3 tools/train_bpe.py [n_merges]   (default 1200)
Deterministic: same inputs -> same table.
"""
import ast
import glob
import re
import sys
from collections import Counter


def stdlib_docstrings():
    out = []
    for path in sorted(glob.glob("/usr/lib/python3.11/*.py")):
        try:
            tree = ast.parse(open(path, encoding="utf-8", errors="ignore").read())
        except SyntaxError:
            continue
        for node in ast.walk(tree):
            if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                                 ast.AsyncFunctionDef)):
                d = ast.get_docstring(node)
                if d:
                    out.append(d)
    return "\n".join(out)


def corpus_text():
    parts = []
    for path in sorted(glob.glob("/usr/share/common-licenses/*")):
        try:
            parts.append(open(path, encoding="utf-8", errors="ignore").read())
        except IsADirectoryError:
            pass
    for path in ["/opt/spark/LICENSE", "/opt/spark/NOTICE",
                 "/opt/spark/README.md"]:
        parts.append(open(path, encoding="utf-8", errors="ignore").read())
    parts.append(stdlib_docstrings())
    text = "\n".join(parts).lower()
    return re.sub(r"[^a-z0-9 .,;:!?'()\-]", " ", text)


def train(text, n_merges):
    vocab = Counter(tuple(w) for w in text.split() if w)
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for word, freq in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        merged = a + b
        new_vocab = Counter()
        for word, freq in vocab.items():
            w = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    w.append(merged)
                    i += 2
                else:
                    w.append(word[i])
                    i += 1
            new_vocab[tuple(w)] += freq
        vocab = new_vocab
    return merges


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    text = corpus_text()
    print(f"training corpus: {len(text)} chars, "
          f"{len(set(text.split()))} unique words")
    merges = train(text, n)
    out = "src/main/resources/graft/bpe_merges.txt"
    with open(out, "w") as f:
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges to {out}")
    print("first 10:", merges[:10])


if __name__ == "__main__":
    main()
