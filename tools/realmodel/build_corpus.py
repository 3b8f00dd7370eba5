"""Build a local byte-level training corpus from system Python sources.

The environment has zero network egress (no HF hub, no dataset downloads) —
documented in REALMODEL.md. The closest available "real data" is the ~500 MB
of Python source text in site-packages + the stdlib: real, highly structured
natural text. We train a byte-level LM on it and use that checkpoint as the
real-model validation target for the quantization pipelines (the analog of
the reference's WikiText-2 ppl regression, ``run_eval.py:44-122``).

Writes cache/realmodel/corpus.npz with train/val uint8 arrays.
"""

import argparse
import hashlib
import os

import numpy as np

ROOTS = [
    "/usr/lib/python3.11",
    "/opt/venv/lib/python3.12/site-packages",
]
SEP = b"\n\x00\n"  # document separator (byte 0 never appears in source)


def iter_files(cap_bytes):
    seen = set()
    total = 0
    for root in ROOTS:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fn)
                try:
                    with open(path, "rb") as f:
                        data = f.read()
                except OSError:
                    continue
                if not (256 < len(data) < 512 * 1024):
                    continue
                try:
                    data.decode("utf-8")
                except UnicodeDecodeError:
                    continue
                h = hashlib.sha1(data).digest()
                if h in seen:  # site-packages duplicates (vendored copies)
                    continue
                seen.add(h)
                yield data
                total += len(data)
                if total >= cap_bytes:
                    return


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="cache/realmodel/corpus.npz")
    p.add_argument("--cap_mb", type=int, default=96)
    p.add_argument("--val_mb", type=int, default=2)
    args = p.parse_args()

    docs = list(iter_files(args.cap_mb * 1024 * 1024))
    rng = np.random.default_rng(0)
    rng.shuffle(docs)
    blob = SEP.join(docs)
    arr = np.frombuffer(blob, np.uint8)
    n_val = args.val_mb * 1024 * 1024
    val, train = arr[:n_val], arr[n_val:]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, train=train, val=val)
    print(f"{len(docs)} files, train={train.size/1e6:.1f}MB "
          f"val={val.size/1e6:.1f}MB -> {args.out}")


if __name__ == "__main__":
    main()
