#!/usr/bin/env python3
"""Reference-vs-rebuild quality showdown (BASELINE.md "mean-IoU parity").

Trains the torch reference (imported from /root/reference, behavioral use
only) and this framework on the SAME synthetic dataset from the SAME initial
weights at the tuned-config scale (neurons=8, lr=3e-4, steplr=1e4 — the
unet_p_res_script.py:1043-1056 protocol), for both plastic rules, then scores
both stacks with the REFERENCE's own evaluation (score_model_best_iou
semantics, /root/reference/src/eval.py:20-64: zero-trace forward per val
sample, 31 logit-space thresholds, iou_metric_batch argmax).

Usage:
  python3 scripts/quality_showdown.py torch --rule hebb --out out/sd_torch_hebb.json
  python3 scripts/quality_showdown.py jax   --rule hebb --out out/sd_jax_hebb.json
  python3 scripts/quality_showdown.py report out/sd_*.json   # -> markdown table

The torch run writes <out>.init.pth with the initial weights; pass the same
--seed to the jax run and it loads that file so both stacks start identical.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SRC = "/root/reference/src"

LR, GAMMA, STEPLR = 3e-4, 0.666, 1e4  # tuned config (unet_p_res_script.py:1043-1056)
NEURONS, NBF, DROPOUT = 8, 101, 0.5


def _import_ref(name: str):
    path = os.path.join(REF_SRC, *name.split(".")) + ".py"
    spec = importlib.util.spec_from_file_location("sd_ref_" + name.replace(".", "_"), path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def make_data(n_train: int, n_val: int, seed: int, hard: bool = False):
    from plastic_unet_tpu.data.synthetic import synthetic_split

    return synthetic_split(n_train, n_val, size=NBF, seed=seed, hard=hard)


def ref_score(preds: np.ndarray, y_val: np.ndarray):
    """Reference score_model_best_iou (eval.py:20-64): 31 logit-space
    thresholds over sigmoid outputs, scored with the reference's
    iou_metric_batch."""
    iou_mod = _import_ref("utils.iou_metric")
    thresholds = np.linspace(0.3, 0.7, 31)
    t_logit = np.log(thresholds / (1 - thresholds))  # eval.py:48-50 quirk
    ious = np.array([iou_mod.iou_metric_batch(y_val, (preds > t).astype(np.float32)) for t in t_logit])
    best = int(np.argmax(ious))
    return float(ious[best]), float(t_logit[best]), ious.tolist()


def _torch_eval_and_emit(net, x_val, y_val, args, losses, train_s, epochs_done):
    """Reference eval semantics (zero trace per val sample, eval.py:81-90),
    then write the result JSON. Factored out so checkpoint-resume and the
    final epoch share one path."""
    import torch

    net.eval()
    preds = []
    with torch.no_grad():
        for img in x_val:
            hebb0 = net.initialZeroHebb()
            y_pred, _ = net(torch.from_numpy(img.astype(np.float32)[None]), hebb0)
            preds.append(y_pred.squeeze().numpy())
    net.train()
    best_iou, best_thr, ious = ref_score(np.stack(preds), y_val.squeeze(1))
    result = {
        "stack": "torch-reference", "rule": args.rule, "epochs": args.epochs,
        "epochs_completed": epochs_done,
        "regime": "hard" if getattr(args, "hard", False) else "default",
        "train_samples": args.train, "val_samples": args.val, "seed": args.seed,
        "best_iou": best_iou, "best_threshold": best_thr,
        "final_loss_mean100": float(np.mean(losses[-100:])),
        "eta": float(net.eta.item()), "train_seconds": round(train_s, 1),
        "images_per_sec": round(epochs_done * args.train / max(train_s, 1e-9), 2),
        "iou_curve": ious,
    }
    out = args.out if epochs_done >= args.epochs else args.out + ".partial"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "iou_curve"}), flush=True)


def run_torch(args):
    import torch

    torch.manual_seed(args.seed)
    torch.set_num_threads(max(os.cpu_count() or 1, 1))
    ref_res = _import_ref("unet.unet_p_res")
    x_train, x_val, y_train, y_val = make_data(args.train, args.val, args.seed,
                                               hard=getattr(args, "hard", False))

    net = ref_res.UNetpRes(
        n_channels=1, n_classes=1, device=torch.device("cpu"),
        neurons=NEURONS, dropout_ratio=DROPOUT, nbf=NBF, rule=args.rule,
    )
    # Shared-init provenance: reuse a committed init if present (the net was
    # still constructed above, so the global-RNG stream for dropout matches a
    # fresh-init run exactly); otherwise write it for the jax arm.
    if os.path.exists(args.out + ".init.pth"):
        net.load_state_dict(torch.load(args.out + ".init.pth", weights_only=True))
        print(f"[torch {args.rule}] init weights loaded from {args.out}.init.pth", flush=True)
    else:
        torch.save(net.state_dict(), args.out + ".init.pth")

    opt = torch.optim.Adam(net.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, gamma=GAMMA, step_size=int(STEPLR))
    crit = torch.nn.BCELoss()

    ckpt_path = args.out + ".ckpt.pth"
    start_epoch, losses, prev_s = 0, [], 0.0
    if getattr(args, "resume", False) and os.path.exists(ckpt_path):
        ck = torch.load(ckpt_path, weights_only=False)
        net.load_state_dict(ck["model"])
        opt.load_state_dict(ck["opt"])
        sched.load_state_dict(ck["sched"])
        torch.set_rng_state(ck["rng"])
        start_epoch, losses, prev_s = ck["epoch"], ck["losses"], ck["train_seconds"]
        print(f"[torch {args.rule}] resumed at epoch {start_epoch} ({prev_s:.0f}s banked)", flush=True)

    ckpt_every = getattr(args, "ckpt_every", 25) or args.epochs
    t0 = time.time()
    net.train()
    for epoch in range(start_epoch, args.epochs):
        hebb = net.initialZeroHebb()
        for img, mask in zip(x_train, y_train):
            opt.zero_grad()
            t_img = torch.from_numpy(img.astype(np.float32)[None])
            y_t = torch.from_numpy(mask.astype(np.float32))
            y_pred, hebb = net(t_img, hebb.detach())
            loss = crit(y_pred.view(-1), y_t.view(-1))
            losses.append(loss.item())
            loss.backward()
            opt.step()
            sched.step()
            hebb = hebb.detach()
        elapsed = prev_s + (time.time() - t0)
        if (epoch + 1) % 10 == 0:
            print(f"[torch {args.rule}] epoch {epoch + 1}/{args.epochs} "
                  f"loss={np.mean(losses[-len(x_train):]):.4f} "
                  f"({elapsed:.0f}s)", flush=True)
        if (epoch + 1) % ckpt_every == 0 and (epoch + 1) < args.epochs:
            tmp = ckpt_path + ".tmp"
            torch.save({"model": net.state_dict(), "opt": opt.state_dict(),
                        "sched": sched.state_dict(), "rng": torch.get_rng_state(),
                        "epoch": epoch + 1, "losses": losses,
                        "train_seconds": elapsed}, tmp)
            os.replace(tmp, ckpt_path)
            _torch_eval_and_emit(net, x_val, y_val, args, losses, elapsed, epoch + 1)
    train_s = prev_s + (time.time() - t0)
    _torch_eval_and_emit(net, x_val, y_val, args, losses, train_s, args.epochs)


def run_jax(args):
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.train.loop import TrainState, create_train_state, make_epoch_fn
    from plastic_unet_tpu.train.optimizer import adam_step_lr
    from plastic_unet_tpu.utils import enable_compilation_cache
    from plastic_unet_tpu.utils.torch_interop import load_pth, state_dict_to_flax_params, unetp_res_name_map

    enable_compilation_cache()
    from plastic_unet_tpu.utils.precision import matmul_precision
    import contextlib
    stack = contextlib.ExitStack()
    stack.enter_context(matmul_precision("parity"))  # true-fp32 matmuls, like torch
    x_train, x_val, y_train, y_val = make_data(args.train, args.val, args.seed,
                                               hard=getattr(args, "hard", False))

    model = UNetPRes(n_channels=1, n_classes=1, neurons=NEURONS, dropout_ratio=DROPOUT,
                     nbf=NBF, rule=args.rule, trunk_pad=getattr(args, "trunk_pad", 0))
    tx = adam_step_lr(LR, GAMMA, STEPLR)
    state = create_train_state(model, tx, jax.random.PRNGKey(args.seed), (NBF, NBF, 1))
    if args.init and os.path.exists(args.init):
        params = state_dict_to_flax_params(load_pth(args.init), unetp_res_name_map())
        state = state._replace(params=params, opt_state=tx.init(params))
        print(f"[jax {args.rule}] initial weights loaded from {args.init}", flush=True)

    # loss_space='probs' = torch BCELoss clamp semantics (exact parity mode)
    epoch_fn = make_epoch_fn(model, tx, loss_space="probs", donate=False)
    X = jnp.asarray(np.transpose(x_train.astype(np.float32), (0, 2, 3, 1)))[:, None]
    Y = jnp.asarray(y_train.astype(np.float32)[:, 0][:, None])  # (S, 1, H, W)
    rng = jax.random.PRNGKey(args.seed + 1)

    t0 = time.time()
    losses_all = []
    for epoch in range(args.epochs):
        state = state._replace(hebb=jnp.zeros_like(state.hebb))
        state, losses = epoch_fn(state, X, Y, jax.random.fold_in(rng, epoch))
        losses_all.extend(np.asarray(losses).tolist())
        if (epoch + 1) % 10 == 0:
            print(f"[jax {args.rule}] epoch {epoch + 1}/{args.epochs} "
                  f"loss={np.mean(losses_all[-args.train:]):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    train_s = time.time() - t0

    # reference eval semantics: zero trace per val sample
    @jax.jit
    def fwd(params, x):
        out = model.apply({"params": params}, x, model.initial_zero_hebb(x.shape[0]), train=False)
        return out.activout

    Xv = jnp.asarray(np.transpose(x_val.astype(np.float32), (0, 2, 3, 1)))
    preds = np.asarray(fwd(state.params, Xv))
    best_iou, best_thr, ious = ref_score(preds, y_val.squeeze(1))
    result = {
        "stack": "plastic_unet_tpu", "rule": args.rule, "epochs": args.epochs,
        "regime": "hard" if getattr(args, "hard", False) else "default",
        "trunk_pad": getattr(args, "trunk_pad", 0),
        "train_samples": args.train, "val_samples": args.val, "seed": args.seed,
        "best_iou": best_iou, "best_threshold": best_thr,
        "final_loss_mean100": float(np.mean(losses_all[-100:])),
        "eta": float(np.asarray(state.params["eta"])[0]), "train_seconds": round(train_s, 1),
        "images_per_sec": round(args.epochs * args.train / train_s, 2),
        "device": str(jax.devices()[0]),
        "iou_curve": ious,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "iou_curve"}))


def run_report(paths):
    rows = []
    for p in paths:
        with open(p) as f:
            rows.append(json.load(f))
    rows.sort(key=lambda r: (r.get("regime", "default"), r["rule"], r["stack"]))
    print("| stack | rule | regime | epochs | best IoU | best thr (logit) | final loss (100) | eta | imgs/s |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['stack']} | {r['rule']} | {r.get('regime', 'default')} | {r['epochs']} "
              f"| {r['best_iou']:.4f} | {r['best_threshold']:.4f} "
              f"| {r['final_loss_mean100']:.4f} | {r['eta']:.4f} | {r['images_per_sec']} |")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("torch", "jax"):
        s = sub.add_parser(name)
        s.add_argument("--rule", choices=["hebb", "oja"], required=True)
        s.add_argument("--epochs", type=int, default=120)
        s.add_argument("--train", type=int, default=256)
        s.add_argument("--val", type=int, default=64)
        s.add_argument("--seed", type=int, default=77)
        s.add_argument("--hard", action="store_true",
                       help="round-5 hard synthetic regime (small/many salt "
                            "bodies, texture-cue only, distractor ellipses) — "
                            "the default task saturates at IoU~1.0")
        s.add_argument("--out", required=True)
        if name == "torch":
            s.add_argument("--resume", action="store_true",
                           help="continue from <out>.ckpt.pth if present")
            s.add_argument("--ckpt-every", dest="ckpt_every", type=int, default=25,
                           help="save ckpt + partial eval every N epochs (0 = never)")
        if name == "jax":
            s.add_argument("--init", default="", help=".pth with initial weights (from the torch run)")
            s.add_argument("--trunk-pad", dest="trunk_pad", type=int, default=0,
                           help="MXU-aligned padded trunk (quality validation of the extension)")
    r = sub.add_parser("report")
    r.add_argument("paths", nargs="+")
    args = ap.parse_args()
    if args.cmd == "torch":
        run_torch(args)
    elif args.cmd == "jax":
        run_jax(args)
    else:
        run_report(args.paths)


if __name__ == "__main__":
    main()
