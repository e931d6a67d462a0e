"""Stage-2 trainer: round-based optimization of the neural SDF model.

TPU re-design of `lab4d/engine/trainer.py` for the volumetric path
(`fg_motion` without "gs-"): per round — eval render, geometry-aux refresh
(marching-tets proxy -> aabb/near-far), then `iters_per_round` jitted train
steps. Initialization runs the reference's prior-fitting loops on device
(camera/intrinsics fit + 1000-step SDF-to-sphere pretrain,
`nerf.py:265-330`, `time.py:76-96`).

Checkpoints are torch-format .pth files (`ckpt_%04d.pth` / `ckpt_latest.pth`)
holding numpy pytrees, honoring the reference's on-disk contract
(`trainer.py:335-369`) without requiring torch to read them back here.
"""

from __future__ import annotations

import functools
import os
import pickle
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidu4d_tpu.ops.numerics import safe_norm, safe_normalize

from vidu4d_tpu.data import data_utils
from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.engine.model import DvrModel
from vidu4d_tpu.engine.optim import make_stage2_optimizer
from vidu4d_tpu.engine.schedules import progress_schedule
from vidu4d_tpu.models.fields.dyn_nerf import FieldState
from vidu4d_tpu.models.fields.time_mlp import (
    camera_prior_loss,
    fit_to_prior,
    init_camera_base_params,
    init_intrinsics_base_params,
    intrinsics_prior_loss,
)
from vidu4d_tpu.ops import geometry as geom
from vidu4d_tpu.ops.marching import extract_mesh_np, save_obj, sample_mesh_surface
from vidu4d_tpu.utils.logging import dump_opts_json
from vidu4d_tpu.ops.quaternion import quaternion_translation_to_se3


class Stage2Trainer:
    def __init__(self, opts: Dict, datasets=None, data_info=None):
        self.opts = dict(opts)
        if datasets is None:
            datasets = data_utils.build_datasets(self.opts)
        self.datasets = datasets
        if data_info is None:
            data_info = data_utils.get_data_info(datasets)
        self.data_info = data_info
        self.frame_info: FrameInfo = data_info["frame_info"]

        self.save_dir = os.path.join(
            opts.get("logroot", "logdir"),
            f"{opts['seqname']}-{opts['logname']}",
        )
        os.makedirs(self.save_dir, exist_ok=True)
        dump_opts_json(self.save_dir, opts)

        self.current_steps = 0
        self.current_round = 0
        self._rollback_cache = [None, None]
        self.total_steps = opts["num_rounds"] * opts["iters_per_round"]

        # per-frame intrinsics prior (already per raw frame)
        intr = data_info["intrinsics"]
        # camera prior: fg (index 1 of rtmat stack) scaled by init_scale later
        rtmat = data_info.get("rtmat")
        self.rtmat_prior = (
            rtmat[1] if rtmat is not None else
            np.tile(np.eye(4, dtype=np.float32), (self.frame_info.num_frames_raw, 1, 1))
        )
        init_scale = 0.1
        rt_scaled = self.rtmat_prior.copy()
        rt_scaled[:, :3, 3] *= init_scale

        self.model = DvrModel(
            frame_info=self.frame_info,
            field_type=opts.get("field_type", "fg"),
            fg_motion=opts.get("fg_motion", "bob"),
            num_inst=1 if opts.get("single_inst", True) else self.frame_info.num_vids,
            intrinsics_prior=tuple(map(tuple, intr)),
            rtmat_prior=tuple(map(tuple, rt_scaled.reshape(len(rt_scaled), -1))),
            rgb_timefree=opts.get("rgb_timefree", False),
            rgb_dirfree=opts.get("rgb_dirfree", False),
            use_wide_near_far=opts.get("use_wide_near_far", False),
            train_res=opts.get("train_res", 256),
            field_depth=opts.get("field_depth", 8),
            field_width=opts.get("field_width", 256),
            train_depth_samples=opts.get("train_depth_samples", 64),
        )
        self.rt_scaled = rt_scaled

        self.states = {
            cate: FieldState.initial(self.frame_info.num_frames_raw)
            for cate in (["fg"] if opts.get("field_type", "fg") == "fg" else
                         ["bg"] if opts["field_type"] == "bg" else ["fg", "bg"])
        }

        self.batcher = data_utils.PairBatcher(
            datasets, imgs_per_batch=opts.get("imgs_per_gpu", 256),
            seed=max(opts.get("seed", 0), 0),
        )

        # multi-chip: data-parallel mesh over the first --ngpu devices; the
        # frame/pixel batch shards over "data", parameters stay replicated
        # and XLA psums the gradients (the DDP+NCCL analog,
        # `lab4d/train.py:20-42`, `trainer.py:126-131`).
        ngpu = opts.get("ngpu", 1) or 1
        self.mesh = None
        if ngpu > 1:
            from vidu4d_tpu.parallel.sharding import make_mesh

            self.mesh = make_mesh(ngpu)

        self._init_params()
        self.optimizer = make_stage2_optimizer(
            self.params,
            learning_rate=opts.get("learning_rate", 5e-4),
            total_steps=self.total_steps,
            num_rounds=opts["num_rounds"],
            intrinsics_lr_mult=opts.get("intrinsics_lr_mult", 1.0),
        )
        self.opt_state = self.optimizer.init(self.params)
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------

    def _example_batch(self):
        batch = self.batcher.next_batch()
        batch = data_utils.flatten_pairs(batch)
        batch = data_utils.compute_frameid(batch, self.frame_info)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _loss_config(self):
        keys = [
            "field_type", "train_res", "no_loss_mask", "maskloss_no_vis2d",
            "mask_wt", "rgb_wt", "depth_wt", "flow_wt", "vis_wt", "feature_wt",
            "feat_reproj_wt", "reg_visibility_wt", "reg_eikonal_wt",
            "reg_deform_cyc_wt", "reg_delta_skin_wt", "reg_skin_entropy_wt",
            "reg_gauss_skin_wt", "reg_cam_prior_wt", "reg_skel_prior_wt",
            "reg_gauss_mask_wt", "reg_soft_deform_wt", "lambda_normal",
            "lambda_dist",
        ]
        defaults = {
            "field_type": "fg", "train_res": 256, "no_loss_mask": False,
            "maskloss_no_vis2d": False, "mask_wt": 0.1, "rgb_wt": 0.1,
            "depth_wt": 1e-4, "flow_wt": 0.5, "vis_wt": 1e-2,
            "feature_wt": 1e-2, "feat_reproj_wt": 5e-2,
            "reg_visibility_wt": 1e-4, "reg_eikonal_wt": 1e-3,
            "reg_deform_cyc_wt": 0.01, "reg_delta_skin_wt": 5e-3,
            "reg_skin_entropy_wt": 5e-4, "reg_gauss_skin_wt": 1e-3,
            "reg_cam_prior_wt": 0.1, "reg_skel_prior_wt": 0.1,
            "reg_gauss_mask_wt": 0.01, "reg_soft_deform_wt": 100.0,
            "lambda_normal": 0.05, "lambda_dist": 0.0,
        }
        return {k: self.opts.get(k, defaults[k]) for k in keys}

    def _init_params(self):
        batch = self._example_batch()
        cfg = self._loss_config()
        weights = progress_schedule(cfg, 0)
        self.params = self.model.init(
            jax.random.PRNGKey(max(self.opts.get("seed", 0), 0)),
            batch, self.states, cfg, weights, jax.random.PRNGKey(1),
            method=self.model.loss,
        )

    # ------------------------------------------------------------------
    # mlp_init: fit priors + SDF pretrain (`trainer.py:112-124` init_model)
    # ------------------------------------------------------------------

    def mlp_init(self, sdf_iters: int = 1000, verbose: bool = True):
        p = dict(self.params["params"])

        # intrinsics fit
        intr_prior = jnp.asarray(self.data_info["intrinsics"])
        intr_params = {"params": p["intrinsics"]}
        intr_params = init_intrinsics_base_params(
            intr_params, self.data_info["intrinsics"], self.frame_info
        )
        intr_module = self.model.intrinsics if hasattr(self.model, "intrinsics") else None
        from vidu4d_tpu.models.fields.time_mlp import IntrinsicsMLP
        intr_module = IntrinsicsMLP(frame_info=self.frame_info)
        intr_params, loss_i, steps_i = fit_to_prior(
            lambda pp: intrinsics_prior_loss(intr_module, pp, intr_prior),
            intr_params, termination_loss=1.0,
        )
        p["intrinsics"] = intr_params["params"]

        # camera fit per field
        from vidu4d_tpu.models.fields.time_mlp import CameraMLP
        cam_module = CameraMLP(frame_info=self.frame_info)
        for cate in self.states:
            field_key = f"fields_{cate}"
            field_params = dict(p[field_key])
            cam_params = {"params": field_params["camera_mlp"]}
            cam_params = init_camera_base_params(
                cam_params, self.rt_scaled, self.frame_info
            )
            prior = jnp.asarray(self.rt_scaled)[
                jnp.asarray(self.frame_info.frame_mapping)
            ]
            cam_params, loss_c, steps_c = fit_to_prior(
                lambda pp: camera_prior_loss(cam_module, pp, prior),
                cam_params, termination_loss=1e-4,
            )
            field_params["camera_mlp"] = cam_params["params"]
            p[field_key] = field_params
            if verbose:
                print(f"[mlp_init] camera[{cate}]: loss={float(loss_c):.6f} "
                      f"steps={int(steps_c)}")

        self.params = {**self.params, "params": p}
        self._geometry_init(sdf_iters=sdf_iters, verbose=verbose)
        self.update_geometry_aux(beta=0.0)

    def _geometry_init(self, sdf_iters: int = 1000, radius: float = 0.1,
                       verbose: bool = True):
        """SDF-to-sphere pretrain (`nerf.py:265-330`, sphere branch
        `deformable.py:110-140`)."""
        model = self.model
        states = self.states
        num_inst = 1 if self.opts.get("single_inst", True) else self.frame_info.num_vids

        def loss_fn(params, rng):
            losses = []
            for idx, (cate, state) in enumerate(sorted(states.items())):
                k1, k2 = jax.random.split(jax.random.fold_in(rng, idx))
                aabb = geom.extend_aabb(state.aabb, factor=0.25)
                pts = aabb[0] + jax.random.uniform(k1, (5000, 3)) * (aabb[1] - aabb[0])
                inst_id = jax.random.randint(k2, (5000,), 0, num_inst)
                sdf_gt = jnp.linalg.norm(pts, axis=-1, keepdims=True) - radius

                def run(mdl):
                    field = mdl.fields[cate]
                    sdf, _ = field.sdf(pts, inst_id=inst_id)
                    vis = field.visibility(pts, inst_id)
                    g = jax.grad(
                        lambda q: jnp.sum(field.sdf(q, inst_id=inst_id)[0])
                    )(pts)
                    return sdf, vis, g

                sdf, vis, g = model.apply(params, method=run)
                sdf_loss = jnp.mean((sdf - sdf_gt) ** 2)
                vis_loss = -jnp.mean(jax.nn.log_sigmoid(vis)) * 0.01
                eik = (safe_norm(g, axis=-1) - 1.0) ** 2
                eik_loss = jnp.sum(eik) / jnp.maximum(jnp.sum(eik > 0), 1.0) * 1e-5
                losses.append(sdf_loss + vis_loss + eik_loss)
            return sum(losses)

        opt = optax.adam(1e-3)

        @jax.jit
        def run_init(params):
            opt_state = opt.init(params)

            def body(i, carry):
                params, opt_state = carry
                rng = jax.random.fold_in(jax.random.PRNGKey(123), i)
                loss, grads = jax.value_and_grad(loss_fn)(params, rng)
                updates, opt_state = opt.update(grads, opt_state)
                return optax.apply_updates(params, updates), opt_state

            params, _ = jax.lax.fori_loop(0, sdf_iters, body, (params, opt_state))
            return params, loss_fn(params, jax.random.PRNGKey(0))

        self.params, final = run_init(self.params)
        if verbose:
            print(f"[mlp_init] sdf pretrain loss={float(final):.6f}")

    # ------------------------------------------------------------------
    # geometry aux: proxy mesh -> aabb / near-far (`multifields.py:221-233`)
    # ------------------------------------------------------------------

    def update_geometry_aux(self, beta: float = 0.9, grid_size: int = 64,
                            n_proxy: int = 64):
        for cate, state in self.states.items():
            aabb_ext = geom.extend_aabb(state.aabb, factor=0.5)
            axes = [np.linspace(float(aabb_ext[0][i]), float(aabb_ext[1][i]),
                                grid_size) for i in range(3)]
            gx, gy, gz = np.meshgrid(*axes, indexing="ij")
            pts = jnp.asarray(
                np.stack([gx, gy, gz], -1).reshape(-1, 3), jnp.float32
            )

            def run(mdl):
                sdf, _ = mdl.fields[cate].sdf(pts)
                return sdf

            sdf = np.asarray(
                jax.jit(lambda p: self.model.apply(p, method=run))(self.params)
            ).reshape(grid_size, grid_size, grid_size)

            verts, faces = extract_mesh_np(sdf, np.asarray(aabb_ext))
            if len(verts) < 4:
                continue
            self._proxy_mesh = (verts, faces)
            proxy_pts, _, _ = sample_mesh_surface(
                verts, faces, n_proxy, rng=np.random.default_rng(0)
            )
            new_aabb = jnp.asarray(
                np.stack([verts.min(0), verts.max(0)]), jnp.float32
            )
            aabb = state.aabb * beta + new_aabb * (1 - beta)

            # near-far from proxy points under current cameras
            def cams(mdl):
                return mdl.fields[cate].camera_vals()

            quat, trans = jax.jit(lambda p: self.model.apply(p, method=cams))(
                self.params
            )
            rtmat = quaternion_translation_to_se3(quat, trans)
            near_far = geom.get_near_far(jnp.asarray(proxy_pts), rtmat)
            frame_map = np.asarray(self.frame_info.frame_mapping)
            nf = np.array(state.near_far)  # writable copy
            nf[frame_map] = nf[frame_map] * beta + np.asarray(near_far) * (1 - beta)

            self.states[cate] = FieldState(
                aabb=aabb,
                near_far=jnp.asarray(nf),
                proxy_pts=jnp.asarray(proxy_pts),
            )

    def export_proxy_mesh(self, path: str):
        if hasattr(self, "_proxy_mesh"):
            save_obj(path, *self._proxy_mesh)

    # ------------------------------------------------------------------
    # train loop
    # ------------------------------------------------------------------

    def _build_train_step(self):
        cfg = self._loss_config()
        model = self.model
        optimizer = self.optimizer
        mesh = self.mesh

        def shard_data(x):
            """Frame-leading batch arrays shard over the mesh "data" axis."""
            if mesh is None or not hasattr(x, "ndim") or x.ndim < 1:
                return x
            if x.shape[0] % mesh.shape["data"]:
                return x
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, PartitionSpec("data"))
            )

        @jax.jit
        def step(params, opt_state, states, batch, weights, rng):
            batch = {k: shard_data(v) for k, v in batch.items()}

            def loss_fn(p):
                loss_dict, _ = model.apply(
                    p, batch, states, cfg, weights, rng, method=model.loss
                )
                return sum(jax.tree.leaves(loss_dict)), loss_dict

            (total, loss_dict), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            gnorm = optax.global_norm(grads)  # pre-clip (trainer.py:874)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, total, loss_dict, gnorm

        return step

    def _update_rollback_cache(self):
        """Two-deep per-round snapshot queue (`trainer.py:134-137,343-353`);
        jax arrays are immutable so holding references is a deep copy."""
        self._rollback_cache[0] = self._rollback_cache[1]
        self._rollback_cache[1] = (self.params, self.opt_state)

    def _maybe_rollback(self, gnorm) -> bool:
        """Rollback to the model from two rounds ago on a gradient spike
        (`trainer.py:862-884` check_grad — disabled upstream via `and False`,
        opt-in here with `rollback_on_grad_spike`)."""
        thresh = self.opts.get("grad_spike_thresh", 5.0)
        if float(gnorm) <= thresh or self._rollback_cache[0] is None:
            return False
        print(f"large grad: {float(gnorm):.2f}, resume from cached weights")
        self.params, self.opt_state = self._rollback_cache[0]
        return True

    def _train_chunk(self, batches, weights_list, rngs):
        """k iterations as one device-resident lax.scan dispatch (the
        Stage-3 trainer's iters_per_dispatch, same rationale)."""
        if not hasattr(self, "_chunk_fn"):
            step = self._train_step

            @jax.jit
            def run_chunk(params, opt_state, states, batches, weights, rngs):
                def body(carry, xs):
                    p, o = carry
                    b, w, r = xs
                    p, o, total, loss_dict, gnorm = step(p, o, states, b, w, r)
                    return (p, o), (total, loss_dict, gnorm)

                (p, o), (totals, lds, gnorms) = jax.lax.scan(
                    body, (params, opt_state), (batches, weights, rngs)
                )
                last_ld = jax.tree.map(lambda x: x[-1], lds)
                return p, o, totals[-1], last_ld, gnorms[-1]

            self._chunk_fn = run_chunk
        stacked_b = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        stacked_w = jax.tree.map(lambda *xs: jnp.asarray(xs), *weights_list)
        return self._chunk_fn(
            self.params, self.opt_state, self.states, stacked_b, stacked_w,
            jnp.stack(rngs),
        )

    def train_one_round(self, log_fn=None):
        opts = self.opts
        cfg = self._loss_config()
        rollback = opts.get("rollback_on_grad_spike", False)
        iters = opts["iters_per_round"]
        k = int(opts.get("iters_per_dispatch", 1) or 1)
        if rollback:
            k = 1  # rollback needs per-iteration gnorm
        done = 0
        total = 0.0
        while done < iters:
            kk = min(k, iters - done)
            if kk > 1:
                batches = [self._example_batch() for _ in range(kk)]
                weights_list = [
                    progress_schedule(cfg, self.current_steps + i)
                    for i in range(kk)
                ]
                rngs = [
                    jax.random.PRNGKey(self.current_steps + i)
                    for i in range(kk)
                ]
                (self.params, self.opt_state, total, loss_dict,
                 gnorm) = self._train_chunk(batches, weights_list, rngs)
                self.current_steps += kk
                done += kk
            else:
                weights = progress_schedule(cfg, self.current_steps)
                batch = self._example_batch()
                rng = jax.random.PRNGKey(self.current_steps)
                params, opt_state, total, loss_dict, gnorm = self._train_step(
                    self.params, self.opt_state, self.states, batch, weights, rng
                )
                self.params, self.opt_state = params, opt_state
                if rollback and self._maybe_rollback(gnorm):
                    continue
                self.current_steps += 1
                done += 1
            if log_fn is not None and self.current_steps % 100 < kk:
                log_fn(self.current_steps, float(total),
                       {key: float(v) for key, v in loss_dict.items()})
        return float(total)

    def train(self, log_fn=None):
        from vidu4d_tpu.utils.logging import ScalarLogger
        from vidu4d_tpu.utils.profiler import round_trace

        logger = ScalarLogger(self.save_dir)
        if log_fn is None:
            log_fn = logger.log_loss_dict
        profile = self.opts.get("profile", False)
        for rnd in range(self.current_round, self.opts["num_rounds"]):
            t0 = time.time()
            self._update_rollback_cache()
            self.update_geometry_aux()
            self.export_geometry(rnd)
            with round_trace(self.save_dir, rnd, enabled=profile):
                total = self.train_one_round(log_fn=log_fn)
            self.current_round = rnd + 1
            if (rnd + 1) % self.opts.get("save_freq", 10) == 0 or (
                rnd + 1 == self.opts["num_rounds"]
            ):
                self.save_checkpoint(self.current_round)
            # per-round wall-clock probe, same format as `trainer.py:309-310`
            print(f"Round {rnd:03d}: time={time.time() - t0:.3f}s loss={total:.4f}")

    def export_geometry(self, rnd: int):
        """Mesh + per-vertex colors/registration features for Stage-3 init
        (`multifields.py:271-303`, `nerf.py:333-366` update_proxy)."""
        path = os.path.join(self.save_dir, f"{rnd:03d}-fg-geo.obj")
        self.export_proxy_mesh(path)
        if hasattr(self, "_proxy_mesh"):
            verts = jnp.asarray(self._proxy_mesh[0])
            cate = list(self.states)[0]

            def run(mdl):
                field = mdl.fields[cate]
                feats = field.features(verts)
                # colors at vertices, viewed along the SDF gradient
                g = jax.grad(lambda q: jnp.sum(field.sdf(q)[0]))(verts)
                g = safe_normalize(g)
                fid = jnp.zeros((verts.shape[0],), jnp.int32)
                rgb, _ = field.query(
                    verts[:, None, None], direction=g[:, None, None],
                    frame_id=fid, inst_id=jnp.zeros_like(fid),
                )
                return feats, rgb[:, 0, 0]

            feats, rgb = jax.jit(lambda p: self.model.apply(p, method=run))(
                self.params
            )
            np.save(os.path.join(self.save_dir, f"{rnd:03d}-fg-feat.npy"),
                    np.asarray(feats))
            np.save(path.replace(".obj", "-colors.npy"), np.asarray(rgb))

    # ------------------------------------------------------------------
    # rendering (render.py backend; `model.py:186-284` evaluate)
    # ------------------------------------------------------------------

    def render_batch(self, batch: Dict, res: int, no_warp: bool = False) -> Dict:
        """Render eval images frame-by-frame (importance-sampled eval path)."""
        model = self.model
        cfg = self._loss_config()

        @jax.jit
        def run_one(params, states, batch_one):
            rendered, _ = model.apply(
                params, batch_one, states, train=False, no_warp=no_warp,
                method=model.render,
            )
            return rendered

        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if "frameid" not in batch:
            batch = data_utils.compute_frameid(batch, self.frame_info)
        n = batch["frameid"].shape[0]
        outs = []
        for i in range(n):
            batch_one = {k: v[i : i + 1] for k, v in batch.items()}
            outs.append(run_one(self.params, self.states, batch_one))
        merged = {}
        for k in outs[0]:
            v = np.concatenate([np.asarray(o[k]) for o in outs], axis=0)
            if v.ndim == 3:  # (M, H*W, c) -> (M, res, res, c)
                v = v.reshape(n, res, res, -1)
            merged[k] = v
        # mask-composite non-mask channels (`model.py:243-252`)
        if "mask" in merged:
            for k in list(merged):
                if k not in ("mask",) and "mask" not in k and merged[k].ndim == 4:
                    merged[k] = merged[k] * merged["mask"]
        return merged

    # ------------------------------------------------------------------
    # checkpointing (`trainer.py:335-437`)
    # ------------------------------------------------------------------

    def save_checkpoint(self, round_count: int):
        payload = {
            "current_steps": self.current_steps,
            "current_round": round_count,
            "params": jax.tree.map(np.asarray, self.params),
            "states": jax.tree.map(np.asarray, self.states),
            "opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                self.opt_state,
            ),
            "opts": self.opts,
        }
        path = os.path.join(self.save_dir, f"ckpt_{round_count:04d}.pth")
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        latest = os.path.join(self.save_dir, "ckpt_latest.pth")
        with open(latest, "wb") as f:
            pickle.dump(payload, f)

    def load_checkpoint(self, path: str, reset_steps: bool = True):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.params = jax.tree.map(jnp.asarray, payload["params"])
        self.states = jax.tree.map(jnp.asarray, payload["states"])
        if not reset_steps:
            self.current_steps = payload["current_steps"]
            self.current_round = payload["current_round"]
        return payload
