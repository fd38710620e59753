#!/usr/bin/env python
"""Per-sample candidate SELECTOR study — the open frontier after best6.

best6's fusion study (runs/best6/fusion_study.py) ended with a clean
negative for per-point fusion but left one designed headroom on the
table: the any-candidate per-sample oracle sits ~4% below the gate
ceiling (val 0.021853 vs pure-AE 0.022814). Harvesting any of it needs a
per-sample *selector* over the candidate set, using only GT-free,
serving-time signals. The reference's only selector is the raw D-gate
(reference models/rl_gan_net.py:162-171), which already failed at the
easier two-way version of this task; this study asks whether ANY simple
learned selector finds signal the D-margin misses.

Protocol (same spirit as gate calibration, train/gate.py): every
selector is FIT on the val split and EVALUATED on the test split — the
val split is the calibration set the serving stack already owns.

Candidates (the fusion-study set):
  ae, rl, union4096, union_fps, union_consensus, ae_plus_gaps

GT-free per-sample features:
  hole_frac     observed-point fraction of the partial input
  d_noisy/d_clean/d_margin   discriminator scores + the gate margin
  gfv_dist      ||G(z) - noisy_gfv||  (how far the GAN path moved)
  z_norm        ||agent z||
  cons_ae/cons_rl   partial-consistency: mean NN distance from the
                observed partial points to each path's output
  disagree      symmetric mean NN distance between the two paths
  d_ae2/d_rl2   D scores of the RE-ENCODED candidate clouds
  enc_drift_ae  ||encode(ae_recon) - noisy_gfv||
  enc_drift_rl  ||encode(rl_pc) - G(z)||

Selectors:
  oracle rows (gate_oracle / any_oracle)       — the ceilings
  always-ae                                    — the incumbent
  calibrated D-gate (ae vs rl, val-swept bias) — the shipped design
  per-feature threshold stump (ae vs rl; ae vs any single candidate)
  ridge regression per candidate -> argmin predicted log-chamfer
  pairwise logistic (ae vs rl) on all features

Usage: python selector_study.py <config> <checkpoint> [--cpu] [--severe]
                                [--batches N]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--severe", action="store_true")
    ap.add_argument("--batches", type=int, default=0)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_rl_3d_tpu.config import load_config
    from gan_rl_3d_tpu.models import rl_gan_net as net
    from gan_rl_3d_tpu.ops import chamfer as chamfer_ops
    from gan_rl_3d_tpu.ops import pointcloud as pc_ops
    from gan_rl_3d_tpu.train import RLGANNetTrainer

    config = load_config(args.config)
    trainer = RLGANNetTrainer(config)
    trainer.load_checkpoint(args.checkpoint)
    spec = trainer.preproc
    if args.severe:
        spec = dataclasses.replace(spec, hole_min=0.5, hole_max=0.8)
    td3 = trainer.td3
    print(f"config: {args.config}  checkpoint: {args.checkpoint}  "
          f"severe: {args.severe}")

    CANDS = ("ae", "rl", "union4096", "union_fps", "union_consensus",
             "ae_plus_gaps")
    FEATS = ("hole_frac", "d_noisy", "d_clean", "d_margin", "gfv_dist",
             "z_norm", "cons_ae", "cons_rl", "disagree", "d_ae2", "d_rl2",
             "enc_drift_ae", "enc_drift_rl")

    def fps_indices(pts, k):
        B, N, _ = pts.shape

        def body(carry, _):
            mind, last = carry
            lastp = jnp.take_along_axis(
                pts, last[:, None, None].astype(jnp.int32), axis=1)
            d = jnp.sum(jnp.square(pts - lastp), axis=-1)
            mind = jnp.minimum(mind, d)
            nxt = jnp.argmax(mind, axis=1)
            return (mind, nxt), nxt

        init = (jnp.full((B, N), jnp.inf), jnp.zeros((B,), jnp.int32))
        (_, _), idx = jax.lax.scan(body, init, None, length=k - 1)
        idx = jnp.concatenate([jnp.zeros((1, B), jnp.int32), idx], axis=0)
        return jnp.transpose(idx)

    @functools.partial(jax.jit, static_argnames=("k",))
    def collect(model, batch, key, k=2048):
        complete, incomplete, mask = pc_ops.make_training_batch(
            key, batch["complete_pc"], do_augment=False, spec=spec)
        out = net.complete(model, incomplete, mask, cfg=td3, hybrid=False)
        rl_pc, ae_pc = out["completed_pc"], out["ae_reconstruction"]
        noisy_gfv, clean_gfv = out["noisy_gfv"], out["clean_gfv"]
        cd = lambda pred: chamfer_ops.chamfer_distance(pred, complete,
                                                       bidirectional=True)
        union = jnp.concatenate([rl_pc, ae_pc], axis=1)
        fidx = fps_indices(union, k)
        fused_fps = jnp.take_along_axis(union, fidx[..., None], axis=1)
        d_rl_to_ae = chamfer_ops.nearest_min_distances(rl_pc, ae_pc)
        d_ae_to_rl = chamfer_ops.nearest_min_distances(ae_pc, rl_pc)
        agree = jnp.concatenate([d_rl_to_ae, d_ae_to_rl], axis=1)
        cidx = jnp.argsort(agree, axis=1)[:, :k]
        fused_cons = jnp.take_along_axis(union, cidx[..., None], axis=1)
        far_idx = jnp.argsort(-d_rl_to_ae, axis=1)[:, :k // 8]
        gaps = jnp.take_along_axis(rl_pc, far_idx[..., None], axis=1)
        ae_gaps = jnp.concatenate([ae_pc, gaps], axis=1)
        cds = {
            "ae": cd(ae_pc),
            "rl": cd(rl_pc),
            "union4096": cd(union),
            "union_fps": cd(fused_fps),
            "union_consensus": cd(fused_cons),
            "ae_plus_gaps": cd(ae_gaps),
        }
        # --- GT-free features ---
        mvalid = mask.astype(jnp.float32)
        msum = jnp.maximum(jnp.sum(mvalid, axis=1), 1.0)
        d_part_ae = chamfer_ops.nearest_min_distances(incomplete, ae_pc)
        d_part_rl = chamfer_ops.nearest_min_distances(incomplete, rl_pc)
        gfv_ae2 = net.encode(model, ae_pc)
        gfv_rl2 = net.encode(model, rl_pc)
        feats = {
            "hole_frac": 1.0 - jnp.mean(mvalid, axis=1),
            "d_noisy": net.discriminate(model, noisy_gfv).reshape(-1),
            "d_clean": net.discriminate(model, clean_gfv).reshape(-1),
            "gfv_dist": jnp.linalg.norm(clean_gfv - noisy_gfv, axis=-1),
            "z_norm": jnp.linalg.norm(out["z_vector"], axis=-1),
            "cons_ae": jnp.sum(d_part_ae * mvalid, axis=1) / msum,
            "cons_rl": jnp.sum(d_part_rl * mvalid, axis=1) / msum,
            "disagree": (jnp.mean(d_rl_to_ae, axis=1)
                         + jnp.mean(d_ae_to_rl, axis=1)),
            "d_ae2": net.discriminate(model, gfv_ae2).reshape(-1),
            "d_rl2": net.discriminate(model, gfv_rl2).reshape(-1),
            "enc_drift_ae": jnp.linalg.norm(gfv_ae2 - noisy_gfv, axis=-1),
            "enc_drift_rl": jnp.linalg.norm(gfv_rl2 - clean_gfv, axis=-1),
        }
        feats["d_margin"] = feats["d_clean"] - feats["d_noisy"]
        return cds, feats, batch["pad"]

    def run_split(loader, name, seed):
        cd_cols, ft_cols = {}, {}
        key = jax.random.PRNGKey(seed)
        for i, batch in enumerate(loader):
            if args.batches and i >= args.batches:
                break
            cds, feats, pad = collect(trainer.model, trainer._put(batch),
                                      jax.random.fold_in(key, i))
            keep = np.asarray(pad) == 0
            for kk, v in cds.items():
                cd_cols.setdefault(kk, []).append(np.asarray(v)[keep])
            for kk, v in feats.items():
                ft_cols.setdefault(kk, []).append(np.asarray(v)[keep])
        C = np.stack([np.concatenate(cd_cols[c]) for c in CANDS], axis=1)
        F = np.stack([np.concatenate(ft_cols[f]) for f in FEATS], axis=1)
        print(f"collected {name}: {C.shape[0]} samples")
        return C.astype(np.float64), F.astype(np.float64)

    # val seeds match fusion_study (2/7) so numbers are comparable
    Cv, Fv = run_split(trainer.val_loader, "val", 2)
    Ct, Ft = run_split(trainer.test_loader, "test", 7)

    iAE, iRL = CANDS.index("ae"), CANDS.index("rl")

    def report(name, val_cd, test_cd, extra=""):
        print(f"  {name:34s} val {val_cd:.6f}  test {test_cd:.6f}  {extra}")

    print("== ceilings and baselines ==")
    report("always-ae", Cv[:, iAE].mean(), Ct[:, iAE].mean())
    report("always-rl", Cv[:, iRL].mean(), Ct[:, iRL].mean())
    report("gate_oracle(min ae,rl)",
           np.minimum(Cv[:, iAE], Cv[:, iRL]).mean(),
           np.minimum(Ct[:, iAE], Ct[:, iRL]).mean())
    report("any_oracle", Cv.min(axis=1).mean(), Ct.min(axis=1).mean())
    win = np.bincount(Ct.argmin(axis=1), minlength=len(CANDS)) / len(Ct)
    print("  test per-candidate win rates: "
          + "  ".join(f"{c}={w:.3f}" for c, w in zip(CANDS, win)))

    # diagnostics: feature correlation with the ae-rl chamfer difference
    # (the signal any two-way selector must read)
    diff_v = Cv[:, iRL] - Cv[:, iAE]
    print("== feature corr with (cd_rl - cd_ae), val ==")
    for j, f in enumerate(FEATS):
        c = np.corrcoef(Fv[:, j], diff_v)[0, 1]
        print(f"  {f:14s} {c:+.3f}")

    def sel_mean(C, choice):
        return C[np.arange(len(C)), choice].mean()

    print("== selectors (fit on val, evaluated on test) ==")

    # 1. calibrated two-way threshold on each single feature (ae vs rl)
    def stump(Cv, Fv, Ct, Ft, j, ia, ib):
        x = Fv[:, j]
        order = np.argsort(x)
        xs = x[order]
        cands = np.concatenate([[xs[0] - 1],
                                (xs[1:] + xs[:-1]) / 2, [xs[-1] + 1]])
        if len(cands) > 512:
            cands = cands[np.linspace(0, len(cands) - 1, 512).astype(int)]
        best = (None, np.inf)
        for sign in (1, -1):
            for t in cands:
                m = np.where(sign * x > sign * t, Cv[:, ib], Cv[:, ia]).mean()
                if m < best[1]:
                    best = ((sign, t), m)
        (sign, t), vm = best
        choice_t = np.where(sign * Ft[:, j] > sign * t, ib, ia)
        return vm, sel_mean(Ct, choice_t), (sign, t)

    best_stump = (None, np.inf, None)
    for j, f in enumerate(FEATS):
        vm, tm, pt = stump(Cv, Fv, Ct, Ft, j, iAE, iRL)
        if vm < best_stump[1]:
            best_stump = (f, vm, (tm, pt))
    f, vm, (tm, pt) = best_stump
    report(f"best stump ae|rl ({f})", vm, tm, f"sign,t={pt}")

    # 2. best stump ae vs EACH candidate (can any single feature route
    #    profitably to a fusion candidate?)
    for ib, cname in enumerate(CANDS):
        if cname == "ae":
            continue
        best = (None, np.inf, None)
        for j, fn in enumerate(FEATS):
            vm, tm, pt = stump(Cv, Fv, Ct, Ft, j, iAE, ib)
            if vm < best[1]:
                best = (fn, vm, tm)
        fn, vm, tm = best
        report(f"best stump ae|{cname} ({fn})", vm, tm)

    # 3. ridge regression per candidate -> argmin predicted log-chamfer
    def zscore(F, mu=None, sd=None):
        if mu is None:
            mu, sd = F.mean(0), F.std(0) + 1e-9
        return (F - mu) / sd, mu, sd

    Zv, mu, sd = zscore(Fv)
    Zt, _, _ = zscore(Ft, mu, sd)
    Xv = np.concatenate([Zv, np.ones((len(Zv), 1))], axis=1)
    Xt = np.concatenate([Zt, np.ones((len(Zt), 1))], axis=1)
    for lam in (1e-2, 1.0, 100.0):
        W = np.linalg.solve(Xv.T @ Xv + lam * np.eye(Xv.shape[1]),
                            Xv.T @ np.log(Cv))
        pv, pt_ = Xv @ W, Xt @ W
        report(f"ridge argmin (lam={lam:g})",
               sel_mean(Cv, pv.argmin(1)), sel_mean(Ct, pt_.argmin(1)))
        # restricted to the two pure paths (the shipped gate's choice set)
        pv2 = np.where(pv[:, iRL] < pv[:, iAE], iRL, iAE)
        pt2 = np.where(pt_[:, iRL] < pt_[:, iAE], iRL, iAE)
        report(f"ridge ae|rl (lam={lam:g})",
               sel_mean(Cv, pv2), sel_mean(Ct, pt2))

    # 4. pairwise logistic ae-vs-rl on all features (gradient-free IRLS)
    y = (Cv[:, iRL] < Cv[:, iAE]).astype(np.float64)
    w = np.zeros(Xv.shape[1])
    for _ in range(50):
        p = 1 / (1 + np.exp(-Xv @ w))
        g = Xv.T @ (p - y) + 1e-2 * w
        H = (Xv * (p * (1 - p))[:, None]).T @ Xv + 1e-2 * np.eye(len(w))
        w -= np.linalg.solve(H, g)
    # sweep the decision probability on val (cost-sensitive choice)
    ps_v = 1 / (1 + np.exp(-Xv @ w))
    ps_t = 1 / (1 + np.exp(-Xt @ w))
    best = (0.5, np.inf)
    for thr in np.linspace(0.05, 0.95, 91):
        m = np.where(ps_v > thr, Cv[:, iRL], Cv[:, iAE]).mean()
        if m < best[1]:
            best = (thr, m)
    thr, vm = best
    tm = np.where(ps_t > thr, Ct[:, iRL], Ct[:, iAE]).mean()
    report("logistic ae|rl (swept thr)", vm, tm, f"thr={thr:.2f}")

    print("done.")


if __name__ == "__main__":
    main()
