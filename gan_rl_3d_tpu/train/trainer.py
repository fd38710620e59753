"""Five-phase curriculum trainer.

API parity with reference RLGANNetTrainer (train_rl_gan_net.py:28-594):
``train_autoencoder`` -> ``generate_gfvs`` -> ``train_latent_gan`` ->
``train_rl_agent`` -> ``joint_training`` / ``train_full_pipeline``, plus
checkpoint save/load — re-orchestrated around jitted steps:

* every phase runs one compiled step per batch; host code only feeds data
  and logs scalars;
* batches are device_put sharded along the mesh "data" axis, parameters
  replicated — XLA all-reduces gradients over ICI;
* the RL phase runs ``envs_per_step`` vectorised episodes (of
  ``steps_per_episode`` env steps each) per device program instead of the
  reference's one-sample Python episodes;
* d_steps discriminator updates per generator update are honoured
  (config'd but ignored in the reference, SURVEY.md §3.3 note).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gan_rl_3d_tpu import nn
from gan_rl_3d_tpu.config import Config, load_config
from gan_rl_3d_tpu.data.dataset import BatchLoader, ShapeNetDataset, setup_dataset
from gan_rl_3d_tpu.models import rl_agent as rl
from gan_rl_3d_tpu.models import rl_gan_net as net
from gan_rl_3d_tpu.parallel import mesh as mesh_lib
from gan_rl_3d_tpu.train import replay_buffer as rb
from gan_rl_3d_tpu.train import steps
from gan_rl_3d_tpu.utils import checkpoint as ckpt_lib
from gan_rl_3d_tpu.utils.metrics_logging import MetricsLogger


class RLGANNetTrainer:
    def __init__(self, config: "Config | str", *, use_orbax: bool = True):
        self.config = (load_config(config) if isinstance(config, str)
                       else config)
        cfg = self.config
        self.td3 = cfg.td3_config()
        self.use_orbax = use_orbax

        self.checkpoint_dir = Path(cfg.training.checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.results_dir = Path(cfg.training.results_dir)
        self.results_dir.mkdir(parents=True, exist_ok=True)
        self.logger = MetricsLogger(
            cfg.training.log_dir,
            use_tensorboard=cfg.logging.use_tensorboard,
            use_wandb=cfg.logging.use_wandb,
            project_name=cfg.logging.project_name)
        # static preprocessing + loss knobs shared by all jitted steps
        self.preproc = cfg.preproc_spec()
        self.bidirectional = cfg.loss.bidirectional
        self.recon_loss = cfg.loss.reconstruction_loss

        precision = cfg.training.precision
        self.compute_dtype = (jnp.bfloat16 if precision.startswith(
            ("bfloat16", "bf16")) else None)
        # "bf16_selective": bf16 matmuls/activations with f32 decoder head
        # + f32 encoder GFV layer (steps._policy_cast_ae_selective)
        self.precision_selective = precision.endswith("_selective")
        # BN training statistics: "centered" (safe default) or the
        # shard-aligned one-HBM-read "single_read_grouped" (nn.py)
        self.bn_stats = cfg.training.bn_stats
        # mesh: all devices data-parallel by default
        self.mesh = mesh_lib.make_mesh()
        nn.validate_bn_stats_mesh(self.bn_stats,
                                  self.mesh.shape[mesh_lib.DATA_AXIS])
        self.key = jax.random.PRNGKey(cfg.training.seed)

        self._setup_data()

        self.key, k_model = jax.random.split(self.key)
        self.model = net.init_model(k_model, cfg)
        self.model = mesh_lib.shard_model_for_mesh(self.mesh, self.model)

        self._save_freq = max(cfg.logging.save_model_frequency, 1)
        self.epoch = 0
        self.current_phase = "autoencoder"
        self.gfvs: Optional[Dict[str, np.ndarray]] = None
        # GFV cache lives under THIS run's checkpoint dir (advisor r4: the
        # old shared data_dir/gfv location let concurrent chains clobber
        # each other's extractions); _load_gfvs still reads a legacy
        # data_dir copy when the run-local one is absent.
        self._gfv_path = self.checkpoint_dir / "gfv" / "gfvs_train.npz"
        # mid-phase resume bookkeeping: set by load_checkpoint, consumed by
        # the phase whose name matches (see _restore_train_state)
        self._resume: Optional[Dict[str, object]] = None
        # whether THIS run produced a gate calibration; a stale sidecar
        # from a previous run must not survive a re-run that overwrites
        # the checkpoints it is scoped to (advisor r3)
        self._gate_calibrated = False

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------

    def _setup_data(self):
        cfg = self.config
        data_dir = Path(cfg.data.data_dir)
        if not data_dir.exists():
            print(f"Dataset not found at {data_dir}; creating synthetic data")
            setup_dataset(str(data_dir), synthetic=True)
        bs = cfg.training.batch_size
        # flat trees without train/test/val directories fall back to the
        # configured fraction-based split (data.train_split etc.)
        fractions = None
        if not (data_dir / "train").exists():
            fractions = (cfg.data.train_split, cfg.data.val_split,
                         cfg.data.test_split)
        # sharded residency needs the shard-aligned shuffle so resident
        # gathers stay device-local (mesh.DATA_SHARD_GROUPS contract)
        groups = (mesh_lib.DATA_SHARD_GROUPS
                  if cfg.training.data_residency == "sharded" else 1)

        def make_loader(split, shuffle):
            return BatchLoader(
                ShapeNetDataset(str(data_dir), split,
                                cfg.model.autoencoder.num_points,
                                seed=cfg.training.seed,
                                split_fractions=fractions,
                                workers=cfg.training.num_workers),
                bs, shuffle=shuffle, seed=cfg.training.seed,
                shard_groups=groups if shuffle else 1)

        self.train_loader = make_loader("train", True)
        # best-checkpoint selection uses the val split when it has data;
        # the test split is reserved for final evaluation (the reference
        # validates directly on 'test', train_rl_gan_net.py:147-154)
        self.val_loader = make_loader("val", False)
        self.test_loader = make_loader("test", False)
        if len(self.val_loader.dataset) == 0:
            self.val_loader = self.test_loader
        print(f"Training samples: {len(self.train_loader.dataset)}")
        print(f"Validation samples: {len(self.val_loader.dataset)}")
        print(f"Test samples: {len(self.test_loader.dataset)}")

    def _put(self, batch):
        return mesh_lib.shard_batch(self.mesh, batch)

    def _resident_train_data(self):
        """The train split placed on device for the scanned AE/joint
        epochs, as ``(array, data_sharded)``: replicated by default;
        row-sharded along "data" when training.data_residency="sharded"
        AND the shard-aligned batch plan holds (every group inside one row
        shard — see BatchLoader.shard_groups / steps._resident_gather).
        Misaligned sizes fall back to replication rather than to a slow or
        silently-clamping gather."""
        data = self.train_loader.dataset.as_array()
        n, bs = len(data), self.train_loader.batch_size
        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        groups = self.train_loader.shard_groups
        aligned = (self.config.training.data_residency == "sharded"
                   and groups > 1 and n % groups == 0 and bs % groups == 0
                   and groups % n_data == 0)
        if aligned:
            return (jax.device_put(data, mesh_lib.row_sharding(self.mesh)),
                    True)
        if self.config.training.data_residency == "sharded":
            print(f"data_residency=sharded: sizes (n={n}, B={bs}, "
                  f"mesh data={n_data}) not aligned to "
                  f"{mesh_lib.DATA_SHARD_GROUPS} groups; replicating")
        return jax.device_put(data, mesh_lib.replicated(self.mesh)), False

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    # ------------------------------------------------------------------
    # phase 1: autoencoder
    # ------------------------------------------------------------------

    def train_autoencoder(self, num_epochs: Optional[int] = None) -> float:
        cfg = self.config.training.autoencoder
        num_epochs = num_epochs or cfg.epochs
        print(f"\n=== PHASE 1: autoencoder ({num_epochs} epochs) ===")
        optimizer = steps.make_ae_optimizer(cfg, len(self.train_loader))
        params = self.model["ae"]["params"]
        bn_state = self.model["ae"]["state"]
        opt_state = optimizer.init(params)
        best_val = float("inf")
        start_epoch = 0
        rst = self._restore_train_state(
            "autoencoder", {"opt_state": opt_state,
                            "best_val": np.float32(0), "epoch": np.int32(0)})
        if rst is not None:
            opt_state = rst["opt_state"]
            best_val = float(rst["best_val"])
            start_epoch = int(rst["epoch"]) + 1

        eval_freq = max(self.config.evaluation.eval_frequency, 1)
        log_freq = max(self.config.logging.log_frequency, 1)
        global_step = start_epoch * len(self.train_loader)
        # the train split lives on device for the whole phase; per epoch
        # only the shuffled batch-index plan (a few KB) crosses the host
        # link, and the epoch runs as ONE compiled scan
        data_dev, data_sharded = self._resident_train_data()
        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            order, pads = self.train_loader.epoch_indices()
            params, bn_state, opt_state, m = steps.ae_train_epoch_resident(
                params, bn_state, opt_state, data_dev,
                jnp.asarray(order), jnp.asarray(pads),
                self._next_key(), optimizer=optimizer,
                compute_dtype=self.compute_dtype,
                batch_sharding=mesh_lib.batch_sharding(self.mesh),
                spec=self._ae_train_spec(epoch, num_epochs),
                recon_loss=self.recon_loss,
                bidirectional=self.bidirectional,
                data_sharded=data_sharded,
                selective=self.precision_selective,
                bn_stats=self.bn_stats)
            losses = np.asarray(m["losses"])
            for i, loss in enumerate(losses):
                if (global_step + i) % log_freq == 0:
                    self.logger.log_scalar("AE/Batch_Loss", float(loss),
                                           global_step + i)
            global_step += len(losses)
            train_loss = float(losses.mean())
            self.logger.log_scalar("AE/Train_Loss", train_loss, epoch)

            # validate per evaluation.eval_frequency (always on the last
            # epoch so "best" tracking has a final word)
            val_loss = None
            if (epoch + 1) % eval_freq == 0 or epoch == num_epochs - 1:
                val_loss = self._validate_ae(params, bn_state)
                self.logger.log_scalar("AE/Val_Loss", val_loss, epoch)
            dt = time.time() - t0
            val_txt = f"val {val_loss:.6f}" if val_loss is not None else ""
            print(f"AE epoch {epoch + 1}/{num_epochs} "
                  f"train {train_loss:.6f} {val_txt} ({dt:.1f}s)")

            self.model["ae"] = {"params": params, "state": bn_state}
            self.epoch = epoch
            if val_loss is not None and val_loss < best_val:
                best_val = val_loss
                self.save_checkpoint("autoencoder_best", epoch, "autoencoder")
            if (epoch + 1) % self._save_freq == 0:
                self.save_checkpoint(
                    f"autoencoder_epoch_{epoch + 1}", epoch, "autoencoder",
                    train_state={"opt_state": opt_state,
                                 "best_val": np.float32(best_val),
                                 "epoch": np.int32(epoch)})
        print(f"AE done; best val loss {best_val:.6f}")
        return best_val

    def _ae_train_spec(self, epoch: int, num_epochs: int):
        """Per-epoch AE preprocessing spec. With
        autoencoder.hole_curriculum, the hole bounds scale easy->target in
        3 equal stages ((s+1)/3 of the configured range) — 3 distinct
        static specs, so the resident epoch compiles exactly 3 times.
        Validation always uses the full target spec (self.preproc)."""
        if not self.config.training.autoencoder.hole_curriculum:
            return self.preproc
        import dataclasses as _dc
        stage = min(3 * epoch // max(num_epochs, 1), 2)
        frac = (stage + 1) / 3.0
        return _dc.replace(self.preproc,
                           hole_min=round(self.preproc.hole_min * frac, 6),
                           hole_max=round(self.preproc.hole_max * frac, 6))

    def _validate_ae(self, params, bn_state) -> float:
        losses = []
        val_key = jax.random.PRNGKey(0)  # fixed holes for comparable epochs
        for i, batch in enumerate(self.val_loader):
            m = steps.ae_eval_step(params, bn_state, self._put(batch),
                                   jax.random.fold_in(val_key, i),
                                   spec=self.preproc,
                                   recon_loss=self.recon_loss,
                                   bidirectional=self.bidirectional)
            losses.append(m["loss"])
        return float(jnp.mean(jnp.stack(losses)))

    # ------------------------------------------------------------------
    # phase 2: GFV extraction
    # ------------------------------------------------------------------

    def generate_gfvs(self) -> Dict[str, np.ndarray]:
        print("\n=== PHASE 2: GFV extraction ===")
        clean_all, noisy_all = [], []
        gkey = jax.random.PRNGKey(self.config.training.seed + 1)
        for i, batch in enumerate(self.train_loader):
            clean, noisy = steps.gfv_extract_step(
                self.model["ae"]["params"], self.model["ae"]["state"],
                self._put(batch), jax.random.fold_in(gkey, i),
                spec=self.preproc)
            keep = batch["pad"] == 0
            clean_all.append(np.asarray(clean)[keep])
            noisy_all.append(np.asarray(noisy)[keep])
        self.gfvs = {"clean": np.concatenate(clean_all),
                     "noisy": np.concatenate(noisy_all)}
        self._gfv_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(self._gfv_path, **self.gfvs)
        print(f"extracted {len(self.gfvs['clean'])} GFV pairs "
              f"-> {self._gfv_path}")
        return self.gfvs

    def _load_gfvs(self) -> Dict[str, np.ndarray]:
        if self.gfvs is None:
            legacy = Path(self.config.data.data_dir) / "gfv" / "gfvs_train.npz"
            path = self._gfv_path if self._gfv_path.exists() else legacy
            if path.exists():
                loaded = np.load(path)
                self.gfvs = {"clean": loaded["clean"],
                             "noisy": loaded["noisy"]}
            else:
                self.generate_gfvs()
        return self.gfvs

    # ------------------------------------------------------------------
    # phase 3: latent WGAN-GP
    # ------------------------------------------------------------------

    def train_latent_gan(self, num_epochs: Optional[int] = None) -> float:
        cfg = self.config.training.lgan
        num_epochs = num_epochs or cfg.epochs
        print(f"\n=== PHASE 3: latent GAN ({num_epochs} epochs, "
              f"d_steps={cfg.d_steps}) ===")
        gfvs = self._load_gfvs()["clean"]
        # phase-specific batch size (config'd but unused in the reference)
        bs = cfg.batch_size or self.config.training.batch_size
        z_dim = self.config.model.lgan.z_dim
        g_opt = steps.make_gan_optimizer(cfg.generator_lr, cfg)
        d_opt = steps.make_gan_optimizer(cfg.discriminator_lr, cfg)
        lgan_params = self.model["lgan"]["params"]
        lgan_state = self.model["lgan"]["state"]
        g_opt_state = g_opt.init(lgan_params["generator"])
        d_opt_state = d_opt.init(lgan_params["discriminator"])
        best_g = float("inf")
        start_epoch = 0
        rst = self._restore_train_state(
            "lgan", {"g_opt_state": g_opt_state, "d_opt_state": d_opt_state,
                     "best_g": np.float32(0), "epoch": np.int32(0)})
        if rst is not None:
            g_opt_state = rst["g_opt_state"]
            d_opt_state = rst["d_opt_state"]
            best_g = float(rst["best_g"])
            start_epoch = int(rst["epoch"]) + 1
        rng = np.random.RandomState(self.config.training.seed)

        n = len(gfvs)
        steps_per_epoch = max(n // bs, 1)
        d_steps = max(cfg.d_steps, 1)
        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            order = rng.permutation(n)
            g_losses, d_losses = [], []
            for si in range(steps_per_epoch):
                # one real batch per D update (reference draws fresh batches
                # when d_steps > 1); at d_steps == 1 an epoch stays one full
                # pass over the permuted GFVs. All d_steps + the G update
                # run as one compiled program; shard the batch axis (axis 1)
                if d_steps == 1:
                    idx = order[si * bs:(si + 1) * bs][None, :]
                else:
                    idx = rng.randint(0, n, size=(d_steps, bs))
                real = jax.device_put(
                    jnp.asarray(gfvs[idx]),
                    jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec(
                            None, mesh_lib.DATA_AXIS)))
                (lgan_params, lgan_state, d_opt_state, g_opt_state,
                 m) = steps.lgan_combined_step(
                    lgan_params, lgan_state, d_opt_state, g_opt_state, real,
                    self._next_key(), d_opt=d_opt, g_opt=g_opt,
                    lambda_gp=cfg.lambda_gp, z_dim=z_dim, d_steps=d_steps)
                d_losses.append(m["d_loss"])
                g_losses.append(m["g_loss"])
            g_loss = float(jnp.mean(jnp.stack(g_losses)))
            d_loss = float(jnp.mean(jnp.stack(d_losses)))
            self.logger.log_scalar("GAN/Generator_Loss", g_loss, epoch)
            self.logger.log_scalar("GAN/Discriminator_Loss", d_loss, epoch)
            dt = time.time() - t0
            print(f"GAN epoch {epoch + 1}/{num_epochs} "
                  f"G {g_loss:.6f} D {d_loss:.6f} ({dt:.1f}s)")

            self.model["lgan"] = {"params": lgan_params, "state": lgan_state}
            # reference picks "best" by lowest G loss (a weak criterion for
            # WGAN, kept for parity: train_rl_gan_net.py:363-365)
            if g_loss < best_g:
                best_g = g_loss
                self.save_checkpoint("lgan_best", epoch, "lgan")
            # periodic checkpoints honour logging.save_model_frequency in
            # every phase (the reference hardcodes 50/200/10 per phase,
            # train_rl_gan_net.py:367-369,446-448,488-489)
            if (epoch + 1) % self._save_freq == 0:
                self.save_checkpoint(
                    f"lgan_epoch_{epoch + 1}", epoch, "lgan",
                    train_state={"g_opt_state": g_opt_state,
                                 "d_opt_state": d_opt_state,
                                 "best_g": np.float32(best_g),
                                 "epoch": np.int32(epoch)})
        self.save_checkpoint("lgan_final", num_epochs - 1, "lgan")
        print(f"LGAN done; best G loss {best_g:.6f}")
        return best_g

    # ------------------------------------------------------------------
    # phase 4: RL agent
    # ------------------------------------------------------------------

    def train_rl_agent(self, num_episodes: Optional[int] = None) -> float:
        cfg = self.config.training.rl_agent
        num_episodes = num_episodes or cfg.episodes
        envs = min(cfg.envs_per_step, self.config.training.batch_size)
        iters = max(num_episodes // envs, 1)
        print(f"\n=== PHASE 4: RL agent ({num_episodes} episodes = "
              f"{iters} x {envs} parallel envs) ===")

        buffer = rb.buffer_init(self.config.model.rl_agent.buffer_size,
                                self.td3.state_dim, self.td3.action_dim)
        ou = rl.ou_init(self.td3, (envs,))
        data = self.train_loader.dataset.as_array()
        rng = np.random.RandomState(self.config.training.seed)
        loss_cfg = self.config.loss
        best_avg = float("-inf")
        rewards_hist = []
        start_it = 0
        rst = self._restore_train_state(
            "rl_agent", {"buffer": buffer, "ou": ou,
                         "best_avg": np.float32(0), "it": np.int32(0)})
        if rst is not None:
            buffer = jax.tree.map(jnp.asarray, rst["buffer"])
            ou = jnp.asarray(rst["ou"])
            best_avg = float(rst["best_avg"])
            start_it = int(rst["it"]) + 1
            for _ in range(start_it):  # replay the data-sampling stream
                rng.randint(0, len(data), size=envs)

        # fixed validation batch + fixed hole-cut key: greedy-policy reward
        # on it is the low-variance learning curve (steps.rl_eval_reward).
        # Rows are sampled EVENLY ACROSS the val split — the split is
        # sorted by path, so taking the first 64 yields a single-category
        # batch whose curve can contradict the full-split result (seen on
        # the variant: the eval-batch chamfer declined while the agent's z
        # beat zero-z by 24% on the full test split). Wrap-pad to a
        # multiple of the mesh's data axis (padded rows carry pad=1 and
        # are excluded from the metric by _masked_mean).
        val_data = self.val_loader.dataset.as_array()
        n_real = int(min(64, len(val_data)))
        spread = np.linspace(0, len(val_data) - 1, n_real).astype(np.int64)
        n_data = self.mesh.shape.get("data", 1) if self.mesh else 1
        n_eval = -(-n_real // n_data) * n_data
        idx = spread[np.arange(n_eval) % n_real]
        pad = (np.arange(n_eval) >= n_real).astype(np.float32)
        eval_batch = self._put({"complete_pc": val_data[idx], "pad": pad})
        eval_key = jax.random.PRNGKey(777)
        eval_every = max(1, iters // 20)

        def log_eval_reward(episode):
            m = steps.rl_eval_reward(
                self.model, eval_batch, eval_key, cfg=self.td3,
                w_chamfer=loss_cfg.w_chamfer, w_gfv=loss_cfg.w_gfv,
                w_discriminator=loss_cfg.w_discriminator,
                spec=self.preproc)
            r, cd = float(m["reward"]), float(m["chamfer"])
            self.logger.log_scalar("RL/Eval_Reward", r, episode)
            self.logger.log_scalar("RL/Eval_Chamfer", cd, episode)
            print(f"  eval reward (greedy, fixed batch) @ep {episode}: "
                  f"{r:.4f}  chamfer {cd:.4f}")
            return r

        log_eval_reward(start_it * envs)
        for it in range(start_it, iters):
            idx = rng.randint(0, len(data), size=envs)
            batch = {"complete_pc": data[idx],
                     "pad": np.zeros((envs,), np.float32)}
            self.model, buffer, ou, m = steps.rl_step(
                self.model, buffer, ou, self._put(batch), self._next_key(),
                cfg=self.td3,
                w_chamfer=loss_cfg.w_chamfer, w_gfv=loss_cfg.w_gfv,
                w_discriminator=loss_cfg.w_discriminator,
                start_training_size=cfg.start_training_steps,
                steps_per_episode=min(max(cfg.steps_per_episode, 1),
                                      cfg.max_steps_per_episode),
                updates_per_step=max(cfg.updates_per_step, 1),
                spec=self.preproc)
            rewards_hist.append(float(m["reward"]))
            episode = (it + 1) * envs
            if (it + 1) % eval_every == 0 or it == iters - 1:
                log_eval_reward(episode)
            if it % 10 == 0 or it == iters - 1:
                avg = float(np.mean(rewards_hist[-10:]))
                self.logger.log_scalar("RL/Episode_Reward", rewards_hist[-1],
                                       episode)
                self.logger.log_scalar("RL/Average_Reward", avg, episode)
                self.logger.log_scalar("RL/Critic_Loss",
                                       float(m["critic_loss"]), episode)
                self.logger.log_scalar("RL/Actor_Loss",
                                       float(m["actor_loss"]), episode)
                print(f"RL iter {it + 1}/{iters} (episode {episode}) "
                      f"reward {rewards_hist[-1]:.4f} avg {avg:.4f}")
                if avg > best_avg:
                    best_avg = avg
                    self.save_checkpoint("rl_agent_best", episode, "rl_agent")
            if (it + 1) % self._save_freq == 0:
                self.save_checkpoint(
                    f"rl_agent_episode_{episode}", episode, "rl_agent",
                    train_state={"buffer": buffer, "ou": ou,
                                 "best_avg": np.float32(best_avg),
                                 "it": np.int32(it)})
        self.save_checkpoint("rl_agent_final", num_episodes, "rl_agent")
        print(f"RL done; best avg reward {best_avg:.4f}")
        return best_avg

    # ------------------------------------------------------------------
    # phase 5: joint fine-tune
    # ------------------------------------------------------------------

    def joint_training(self, num_epochs: Optional[int] = None) -> float:
        cfg = self.config.training.joint
        num_epochs = num_epochs or cfg.epochs
        print(f"\n=== PHASE 5: joint fine-tune ({num_epochs} epochs) ===")
        optimizer = steps.make_joint_optimizer(cfg)
        trainable = {"ae": self.model["ae"]["params"]}
        if not cfg.freeze_generator:
            trainable["gen"] = self.model["lgan"]["params"]["generator"]
        else:
            print("joint: generator FROZEN (phase-3 G preserved; "
                  "joint.freeze_generator)")
        if cfg.preserve_gan_path and "gan_path" not in self.model:
            # snapshot the serving GAN branch exactly as phase 4 trained
            # the agent against it (jax arrays are immutable and the joint
            # step rebuilds — never mutates — the lgan/ae subtrees, so
            # holding references is a true snapshot)
            self.model["gan_path"] = {
                "generator": {
                    "params": self.model["lgan"]["params"]["generator"],
                    "state": self.model["lgan"]["state"]["generator"]},
                "decoder": {
                    "params": self.model["ae"]["params"]["decoder"],
                    "state": self.model["ae"]["state"]["decoder"]},
            }
            print("joint: serving GAN branch SNAPSHOTTED (pre-joint G + "
                  "decoder; joint.preserve_gan_path)")
        opt_state = optimizer.init(trainable)
        best_val = float("inf")
        start_epoch = 0
        rst = self._restore_train_state(
            "joint", {"opt_state": opt_state, "best_val": np.float32(0),
                      "epoch": np.int32(0)})
        if rst is not None:
            opt_state = rst["opt_state"]
            best_val = float(rst["best_val"])
            start_epoch = int(rst["epoch"]) + 1

        # device-resident data + one scan per epoch (see train_autoencoder)
        data_dev, data_sharded = self._resident_train_data()
        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            order, pads = self.train_loader.epoch_indices()
            self.model, opt_state, m = steps.joint_train_epoch_resident(
                self.model, opt_state, data_dev,
                jnp.asarray(order), jnp.asarray(pads),
                self._next_key(), optimizer=optimizer, cfg=self.td3,
                compute_dtype=self.compute_dtype,
                batch_sharding=mesh_lib.batch_sharding(self.mesh),
                spec=self.preproc, bidirectional=self.bidirectional,
                w_ae_recon=cfg.w_ae_recon,
                selective=self.precision_selective,
                bn_stats=self.bn_stats,
                freeze_generator=cfg.freeze_generator,
                data_sharded=data_sharded)
            train_loss = float(np.asarray(m["losses"]).mean())

            val_losses = []
            vkey = jax.random.PRNGKey(1)
            for i, batch in enumerate(self.val_loader):
                vm = steps.joint_eval_step(self.model, self._put(batch),
                                           jax.random.fold_in(vkey, i),
                                           cfg=self.td3, spec=self.preproc,
                                           bidirectional=self.bidirectional,
                                           gate_mode=self.config.model.gate_mode,
                                           gate_bias=self.config.model.gate_bias)
                val_losses.append(vm["loss"])
            val_loss = float(jnp.mean(jnp.stack(val_losses)))

            self.logger.log_scalar("Joint/Train_Loss", train_loss, epoch)
            self.logger.log_scalar("Joint/Val_Loss", val_loss, epoch)
            dt = time.time() - t0
            print(f"Joint epoch {epoch + 1}/{num_epochs} "
                  f"train {train_loss:.6f} val {val_loss:.6f} ({dt:.1f}s)")
            if val_loss < best_val:
                best_val = val_loss
                self.save_checkpoint("joint_best", epoch, "joint")
            if (epoch + 1) % self._save_freq == 0:
                self.save_checkpoint(
                    f"joint_epoch_{epoch + 1}", epoch, "joint",
                    train_state={"opt_state": opt_state,
                                 "best_val": np.float32(best_val),
                                 "epoch": np.int32(epoch)})
        print(f"Joint done; best val loss {best_val:.6f}")
        return best_val

    # ------------------------------------------------------------------
    # phase 5.5: discriminator refresh + gate calibration (TPU additions —
    # the fix for the reference design's stale post-joint hybrid gate)
    # ------------------------------------------------------------------

    def refresh_discriminator(self, num_steps: Optional[int] = None) -> float:
        """Retrain the discriminator on the post-joint GFV distribution:
        re-extract clean GFVs with the (fine-tuned) encoder, then run
        ``num_steps`` WGAN-GP D updates with the generator frozen
        (steps.lgan_d_refresh). Fixes the gate staleness the reference
        design bakes in: its D is trained in phase 3 and never sees the
        GFVs phase 5 produces (reference models/rl_gan_net.py:162-171
        gates with that stale D)."""
        cfg = self.config.training.joint
        lgan_cfg = self.config.training.lgan
        num_steps = num_steps or cfg.refresh_d_steps
        print(f"\n=== PHASE 5.5a: discriminator refresh "
              f"({num_steps} D steps) ===")
        self.generate_gfvs()  # re-extract with the post-joint encoder
        gfvs = self.gfvs["clean"]
        bs = lgan_cfg.batch_size or self.config.training.batch_size
        d_opt = steps.make_gan_optimizer(lgan_cfg.discriminator_lr, lgan_cfg)
        d_opt_state = d_opt.init(self.model["lgan"]["params"]["discriminator"])
        rng = np.random.RandomState(self.config.training.seed + 5)
        idx = rng.randint(0, len(gfvs), size=(num_steps, bs))
        real = jax.device_put(
            jnp.asarray(gfvs[idx]),
            jax.sharding.NamedSharding(
                self.mesh,
                jax.sharding.PartitionSpec(None, mesh_lib.DATA_AXIS)))
        t0 = time.time()
        # with a preserved serving GAN branch the gate's critic must score
        # the generator it will actually gate — draw the refresh fakes
        # from the snapshot G, then keep only the refreshed D in the live
        # model (the live G stays whatever joint training left)
        snap = self.model.get("gan_path")
        refresh_params = self.model["lgan"]["params"]
        refresh_state = self.model["lgan"]["state"]
        if snap is not None:
            print("D refresh: fakes from the PRESERVED serving generator "
                  "(joint.preserve_gan_path)")
            refresh_params = dict(refresh_params,
                                  generator=snap["generator"]["params"])
            refresh_state = dict(refresh_state,
                                 generator=snap["generator"]["state"])
        lgan_params, lgan_state, _, m = steps.lgan_d_refresh(
            refresh_params, refresh_state,
            d_opt_state, real, self._next_key(), d_opt=d_opt,
            lambda_gp=lgan_cfg.lambda_gp,
            z_dim=self.config.model.lgan.z_dim)
        if snap is not None:
            lgan_params = dict(lgan_params,
                               generator=self.model["lgan"]["params"]
                               ["generator"])
            lgan_state = dict(lgan_state,
                              generator=self.model["lgan"]["state"]
                              ["generator"])
        self.model["lgan"] = {"params": lgan_params, "state": lgan_state}
        d_losses = np.asarray(m["d_losses"])
        print(f"D refresh done in {time.time() - t0:.1f}s: loss "
              f"{d_losses[0]:.4f} -> {d_losses[-1]:.4f}")
        self.logger.log_scalar("GAN/Refresh_D_Loss", float(d_losses[-1]), 0)
        return float(d_losses[-1])

    def calibrate_gate(self) -> Dict[str, object]:
        """Sweep the hybrid gate's decision threshold on the val split and
        persist the val-chamfer-minimising (gate_mode, gate_bias) as
        ``gate_calibration.json`` next to the checkpoints (preferred by
        evaluate.py / complete_clouds.py over the static config knobs)."""
        from gan_rl_3d_tpu.train import gate as gate_lib

        print("\n=== PHASE 5.5b: gate calibration (val split) ===")
        stats = gate_lib.gate_statistics(
            self.model, self.val_loader, self._put, jax.random.PRNGKey(2),
            cfg=self.td3, spec=self.preproc,
            bidirectional=self.bidirectional)
        report = gate_lib.calibrate_gate(stats)
        # scope the sidecar to the checkpoints that actually carry the
        # refreshed discriminator it was calibrated against
        report["checkpoints"] = ["joint_calibrated", "final"]
        path = gate_lib.save_gate_calibration(str(self.checkpoint_dir),
                                              report)
        self._gate_calibrated = True
        print(f"gate: mode={report['gate_mode']} "
              f"bias={report['gate_bias']:.4f} "
              f"val chamfer {report['val_chamfer_raw_gate']:.6f} (raw) -> "
              f"{report['val_chamfer_calibrated']:.6f} (calibrated); "
              f"paths rl {report['val_chamfer_rl']:.6f} / "
              f"ae {report['val_chamfer_ae']:.6f}, "
              f"oracle {report['oracle_chamfer']:.6f} -> {path}")
        return report

    # ------------------------------------------------------------------
    # pipeline / checkpointing
    # ------------------------------------------------------------------

    def train_full_pipeline(self, start_phase: Optional[str] = None):
        """Run the 5-phase curriculum. When resuming from a checkpoint the
        completed phases are skipped and training restarts at the stored
        phase (the reference loads the phase but never uses it to skip
        work — train_rl_gan_net.py:617-619)."""
        t = self.config.training
        order = ("autoencoder", "lgan", "rl_agent", "joint")
        start_idx = order.index(start_phase or self.current_phase)
        if start_idx > 0:
            print(f"resuming pipeline at phase {order[start_idx]!r}")
        if start_idx <= 0:
            self.train_autoencoder(t.autoencoder.epochs)
            self.generate_gfvs()
        if start_idx <= 1:
            self.train_latent_gan(t.lgan.epochs)
        if start_idx <= 2:
            self.train_rl_agent(t.rl_agent.episodes)
        if start_idx <= 3 and t.joint.enabled:
            self.joint_training(t.joint.epochs)
            self.post_joint_refresh()
        print("\n=== TRAINING COMPLETE ===")
        self.save_checkpoint("final", self.epoch, "joint")

    def post_joint_refresh(self):
        """Phase 5.5 when configured: D refresh + gate calibration on the
        best joint model, saved as ``joint_calibrated`` (also what the
        pipeline's ``final`` checkpoint then contains)."""
        t = self.config.training.joint
        if not (t.refresh_d_steps > 0 or t.calibrate_gate):
            return
        self.load_checkpoint("joint_best")
        self._resume = None  # not a mid-phase resume
        if t.refresh_d_steps > 0:
            self.refresh_discriminator(t.refresh_d_steps)
        if t.calibrate_gate:
            self.calibrate_gate()
        self.save_checkpoint("joint_calibrated", self.epoch, "joint")

    def save_checkpoint(self, name: str, epoch: int, phase: str,
                        train_state: Optional[dict] = None):
        """Save the model bundle; with ``train_state`` also persist the
        phase's optimizer moments (and RL buffer) as a ``_trainstate``
        sibling so ``--resume`` continues the trajectory instead of
        silently re-initialising them (the reference persists only the
        agent's optimizers, rl_agent.py:369-381, and never restores
        mid-phase)."""
        path = self.checkpoint_dir / name
        # overwriting a checkpoint that a PREVIOUS run's calibration
        # sidecar is scoped to, without having re-calibrated in this run,
        # would leave the old bias applying to a different discriminator
        # — descope it (advisor r3)
        if not self._gate_calibrated:
            from gan_rl_3d_tpu.train import gate as gate_lib
            gate_lib.descope_gate_calibration(str(self.checkpoint_dir), name)
        # the gan_path snapshot (joint.preserve_gan_path) rides as a
        # ``_ganpath`` sibling — like ``_trainstate`` — so the main
        # checkpoint tree keeps one canonical structure for every phase
        # and pre-snapshot checkpoints restore unchanged
        model = dict(self.model)
        gan_path = model.pop("gan_path", None)
        tree = {"model": model,
                "meta": {"epoch": np.int32(epoch),
                         "phase_idx": np.int32(net.PHASES.index(phase))}}
        ckpt_lib.save_checkpoint(str(path), tree, use_orbax=self.use_orbax)
        if gan_path is not None:
            ckpt_lib.save_checkpoint(str(path) + "_ganpath", gan_path,
                                     use_orbax=self.use_orbax)
        else:
            # overwriting a checkpoint name without a snapshot must also
            # remove any stale sibling a previous preserve_gan_path run
            # left behind — otherwise load_checkpoint would silently
            # resurrect the old serving branch (same staleness class as
            # the gate_calibration.json descoping above)
            gp = path.parent / (name + "_ganpath")
            if gp.is_dir():
                import shutil
                shutil.rmtree(gp)
            elif gp.exists():
                gp.unlink()
        if train_state is not None:
            ckpt_lib.save_checkpoint(str(path) + "_trainstate", train_state,
                                     use_orbax=self.use_orbax)

    def load_checkpoint(self, name: str) -> Tuple[int, str]:
        path = self.checkpoint_dir / name
        target_model = {k: v for k, v in self.model.items()
                        if k != "gan_path"}
        target = {"model": target_model,
                  "meta": {"epoch": np.int32(0), "phase_idx": np.int32(0)}}
        tree = ckpt_lib.load_checkpoint(str(path), target,
                                        use_orbax=self.use_orbax)
        model = tree["model"]
        # restore the serving-GAN-branch snapshot sibling when the
        # checkpoint carries one (joint.preserve_gan_path); drop any
        # in-memory snapshot otherwise (loading a pre-joint checkpoint
        # must not keep serving a stale branch)
        gp_path = path.parent / (name + "_ganpath")
        if gp_path.exists():
            gp_target = {
                "generator": {
                    "params": model["lgan"]["params"]["generator"],
                    "state": model["lgan"]["state"]["generator"]},
                "decoder": {
                    "params": model["ae"]["params"]["decoder"],
                    "state": model["ae"]["state"]["decoder"]},
            }
            model = dict(model)
            model["gan_path"] = ckpt_lib.load_checkpoint(
                str(gp_path), gp_target, use_orbax=self.use_orbax)
        self.model = mesh_lib.shard_model_for_mesh(self.mesh, model)
        epoch = int(tree["meta"]["epoch"])
        phase = net.PHASES[int(tree["meta"]["phase_idx"])]
        self.current_phase = phase
        self._resume = {"name": name, "phase": phase, "epoch": epoch}
        print(f"loaded checkpoint {path} (epoch {epoch}, phase {phase})")
        return epoch, phase

    def _restore_train_state(self, phase: str,
                             target: dict) -> Optional[dict]:
        """When resuming into ``phase`` from a checkpoint that has a
        ``_trainstate`` sibling, restore it against ``target`` (the freshly
        initialised optimizer/buffer pytree — same structure). Consumed
        once: later phases start their optimizers fresh, as they should."""
        if not self._resume or self._resume["phase"] != phase:
            return None
        resume, self._resume = self._resume, None
        path = self.checkpoint_dir / (str(resume["name"]) + "_trainstate")
        if not ckpt_lib.checkpoint_exists(str(path)):
            return None
        state = ckpt_lib.load_checkpoint(str(path), target,
                                         use_orbax=self.use_orbax)
        print(f"restored {phase} train state from {path} "
              f"(epoch {resume['epoch']})")
        return state

    def close(self):
        self.logger.close()
