"""Train the byte-level validation LM on the local Python-source corpus.

Produces the "real-ish" checkpoint used for end-to-end quantization quality
validation (VERDICT r1 item 3: no network -> no HF checkpoints; this is the
documented fallback). Runs on the real TPU chip; steps are scan-chunked so
the axon tunnel's ~29 ms per-dispatch cost amortizes.

Checkpoint: cache/realmodel/ckpt.npz (stacked-pytree llama params, f32)
plus a loss log. Geometry: d=512 L=8 H=8 f=1536 vocab=256 — big enough
that 2-bit quantization quality is meaningful, small enough to train in
minutes.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))


def save_params(path, params):
    import jax
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params(path):
    """Inverse of save_params for the known two-level layout."""
    import jax.numpy as jnp
    z = np.load(path)
    params = {}
    for key in z.files:
        parts = key.split("/")
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(z[key])
    return params


def model_preset(name, seq):
    """Local validation-model geometries (see REALMODEL.md)."""
    from guidedquant_tpu.models.config import ModelConfig
    presets = {
        # byte-vocab 27M (round-1/2 validation target)
        "pybyte-27m": dict(vocab_size=256, hidden_size=512,
                           intermediate_size=1536, num_layers=8, num_heads=8),
        # word-vocab (16k BPE) ~190M — the guidance fair-trial model
        # (VERDICT r2 next 3): big enough for a non-flat saliency spectrum.
        "pyword-190m": dict(vocab_size=16384, hidden_size=1024,
                            intermediate_size=2816, num_layers=12,
                            num_heads=16),
    }
    kw = presets[name]
    return ModelConfig(
        name=name, num_kv_heads=kw["num_heads"], rope_theta=10000.0,
        rms_norm_eps=1e-5, max_seq_len=seq, tie_word_embeddings=False, **kw)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pybyte-27m")
    p.add_argument("--corpus", default="cache/realmodel/corpus.npz")
    p.add_argument("--out", default="cache/realmodel/ckpt.npz")
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--chunk", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--remat", action="store_true",
                   help="checkpoint each layer (needed for pyword-190m: "
                        "without it the 12-layer saved activations OOM the "
                        "16 GB chip)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 activations/matmuls (params stay f32 masters)")
    p.add_argument("--save_every", type=int, default=2000,
                   help="periodic checkpoint interval in steps (params + "
                        "adam moments + step, atomic rename); 0 disables")
    p.add_argument("--resume", action="store_true",
                   help="resume from <out>.part if present (rebuilds the rng "
                        "stream position from the saved step)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from guidedquant_tpu.models import llama

    cfg = model_preset(args.model, args.seq)

    z = np.load(args.corpus)
    train, val = z["train"], z["val"]
    print(f"corpus: train={train.size/1e6:.1f}MB val={val.size/1e6:.1f}MB")

    params = llama.init_params(cfg, jax.random.PRNGKey(args.seed))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e6:.1f}M params")

    warmup = min(200, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, args.lr * 0.1)
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)

    def loss_fn(params, tokens):
        # cross_entropy_loss shifts internally (HF labels=input_ids
        # convention): pass the SAME [B, S+1] tokens as inputs and labels.
        if args.bf16:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), params)
        logits = llama.forward(params, cfg, tokens, remat=args.remat)
        return llama.cross_entropy_loss(logits, tokens)

    def one_step(carry, tokens):
        params, opt_state, step = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, step + 1), loss

    @jax.jit
    def chunk_steps(params, opt_state, step, tokens_chunk):
        (params, opt_state, step), losses = jax.lax.scan(
            one_step, (params, opt_state, step), tokens_chunk)
        return params, opt_state, step, losses.mean()

    @jax.jit
    def val_loss_fn(params, tokens):
        return loss_fn(params, tokens)

    def sample_batch(rng, n):
        starts = rng.integers(0, train.size - args.seq - 1,
                              size=(n, args.batch))
        idx = starts[..., None] + np.arange(args.seq + 1)
        return train[idx].astype(np.int32)

    rng = np.random.default_rng(args.seed)
    step = jnp.zeros((), jnp.int32)
    log = []
    t0 = time.time()
    n_chunks = args.steps // args.chunk
    start_chunk = 0
    part_path = args.out + ".part"

    def save_state(path, params, opt_state, done_steps):
        """Atomic full training-state snapshot (params + adam mu/nu)."""
        flat = {}
        for name, tree in (("p", params), ("mu", opt_state[0].mu),
                           ("nu", opt_state[0].nu)):
            for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                key = name + "/" + "/".join(
                    str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
                flat[key] = np.asarray(leaf)
        flat["__step__"] = np.int64(done_steps)
        # crash-safe write: fsync data before the rename and the directory
        # after, else a killed process can leave the renamed entry
        # unresolvable (observed on this box's overlay filesystem).
        with open(path + ".tmp.npz", "wb") as f:
            np.savez(f, **flat)
            f.flush()
            os.fsync(f.fileno())
        os.replace(path + ".tmp.npz", path)
        dfd = os.open(os.path.dirname(os.path.abspath(path)), os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    if args.resume and os.path.exists(part_path):
        z = np.load(part_path)
        done = int(z["__step__"])
        trees = {"p": {}, "mu": {}, "nu": {}}
        for key in z.files:
            if key == "__step__":
                continue
            parts = key.split("/")
            d = trees[parts[0]]
            for q in parts[1:-1]:
                d = d.setdefault(q, {})
            d[parts[-1]] = jnp.asarray(z[key])
        params = trees["p"]
        # adamw state = (ScaleByAdamState(count, mu, nu), EmptyState,
        # ScaleByScheduleState(count)); both counts drive warmup/decay.
        inner = opt_state[0]._replace(
            count=jnp.asarray(done, jnp.int32), mu=trees["mu"],
            nu=trees["nu"])
        tail = tuple(
            s._replace(count=jnp.asarray(done, jnp.int32))
            if "count" in getattr(s, "_fields", ()) else s
            for s in opt_state[1:])
        opt_state = (inner,) + tail
        step = jnp.asarray(done, jnp.int32)
        start_chunk = done // args.chunk
        # replay the rng stream so resumed batches differ from seen ones
        for _ in range(start_chunk):
            sample_batch(rng, args.chunk)
        print(f"resumed from {part_path} at step {done}", flush=True)

    for c in range(start_chunk, n_chunks):
        toks = sample_batch(rng, args.chunk)
        params, opt_state, step, mloss = chunk_steps(
            params, opt_state, step, jnp.asarray(toks))
        if c % 10 == 0 or c == n_chunks - 1:
            # held-out bits-per-byte
            vstarts = rng.integers(0, val.size - args.seq - 1, size=args.batch)
            vidx = vstarts[:, None] + np.arange(args.seq + 1)
            vl = float(val_loss_fn(params, jnp.asarray(val[vidx], jnp.int32)))
            done = (c + 1) * args.chunk
            rec = {"step": done, "train_loss": float(mloss),
                   "val_loss": vl, "val_bpb": vl / np.log(2),
                   "elapsed_s": round(time.time() - t0, 1)}
            log.append(rec)
            print(json.dumps(rec), flush=True)
        done = (c + 1) * args.chunk
        if args.save_every and done % args.save_every == 0 and \
                done < args.steps:
            save_state(part_path, jax.device_get(params),
                       jax.device_get(opt_state), done)
            print(f"checkpointed {part_path} at step {done}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_params(args.out, jax.device_get(params))
    if os.path.exists(part_path):
        os.remove(part_path)
    with open(args.out.replace(".npz", "_log.json"), "w") as f:
        json.dump({"config": cfg.name, "steps": args.steps, "log": log}, f,
                  indent=1)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
