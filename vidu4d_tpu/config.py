"""Configuration: absl flags mirroring the reference `lab4d/config.py`.

Flag names and defaults match the reference so that its published recipes
(`README.md:36-50`) and `opts.log` flagfiles work unchanged. Vestigial flags
of broken reference paths (two_branch GSDF, gen3d SDS, flexicubes — see
SURVEY.md §1 "Vestigial") are accepted but unused.

`save_config()` appends to `logdir/<seqname>-<logname>/opts.log`, which
`render.py` / `export.py` re-read via `--flagfile` (`config.py:244-250`).
"""

from __future__ import annotations

import os

from absl import flags

opts = flags.FLAGS


class TrainModelConfig:
    # weights of reconstruction terms (config.py:75-105)
    flags.DEFINE_float("mask_wt", 0.1, "weight for silhouette loss")
    flags.DEFINE_float("rgb_wt", 0.1, "weight for color loss")
    flags.DEFINE_float("depth_wt", 1e-4, "weight for depth loss")
    flags.DEFINE_float("flow_wt", 0.5, "weight for flow loss")
    flags.DEFINE_float(
        "flow_noise_px", 2.5,
        "stage-3 flow-SNR floor in px: GT flow below the estimator noise "
        "band is not supervised (0 disables)",
    )
    flags.DEFINE_float("vis_wt", 1e-2, "weight for visibility loss")
    flags.DEFINE_float("feature_wt", 1e-2, "weight for feature reconstruction loss")
    flags.DEFINE_float("feat_reproj_wt", 5e-2, "weight for feature reprojection loss")

    # weights of regularization terms
    flags.DEFINE_float("reg_visibility_wt", 1e-4, "visibility regularization")
    flags.DEFINE_float("reg_eikonal_wt", 1e-3, "eikonal regularization")
    flags.DEFINE_float("reg_deform_cyc_wt", 0.01, "deform cycle regularization")
    flags.DEFINE_integer(
        "cycle_subsample", 4,
        "stage-3: strided surfel subset for the cycle/skin warp "
        "regularizers (1 = every surfel)",
    )
    flags.DEFINE_float("reg_delta_skin_wt", 5e-3, "delta skinning reg")
    flags.DEFINE_float("reg_skin_entropy_wt", 5e-4, "skinning entropy reg")
    flags.DEFINE_float("reg_gauss_skin_wt", 1e-3, "gauss skinning consistency")
    flags.DEFINE_float("reg_cam_prior_wt", 0.1, "camera prior regularization")
    flags.DEFINE_float("reg_skel_prior_wt", 0.1, "skeleton prior regularization")
    flags.DEFINE_float("reg_gauss_mask_wt", 0.01, "gauss mask regularization")
    flags.DEFINE_float("reg_soft_deform_wt", 100.0, "soft deformation reg")

    # model
    flags.DEFINE_string("field_type", "fg", "{bg, fg, comp}")
    flags.DEFINE_string(
        "fg_motion", "rigid", "{rigid, dense, bob, skel-human, skel-quad, gs-XXX}"
    )
    flags.DEFINE_bool("single_inst", True, "assume the same morphology over objs")
    flags.DEFINE_boolean("rgb_timefree", False, "drop time-dependent appearance code")
    flags.DEFINE_boolean("rgb_dirfree", False, "drop view-direction conditioning")
    flags.DEFINE_boolean("use_wide_near_far", False, "near-far from proxy each step")


class TrainOptConfig:
    # io-related (config.py:114-152)
    flags.DEFINE_string("seqname", "cat", "name of the sequence")
    flags.DEFINE_string("logname", "tmp", "name of the saved log")
    flags.DEFINE_string("data_prefix", "crop", "prefix of data entries, {crop, full}")
    flags.DEFINE_integer("train_res", 256, "size of training images")
    flags.DEFINE_string("logroot", "logdir/", "root directory for log files")
    flags.DEFINE_string("load_suffix", "", "suffix of params, {latest, 0, 10, ...}")
    flags.DEFINE_string("feature_type", "dinov2", "{dinov2, cse}")
    flags.DEFINE_string("load_path", "", "path to load pretrained model")

    # accuracy-related
    flags.DEFINE_float("learning_rate", 5e-4, "learning rate")
    flags.DEFINE_integer("num_rounds", 20, "number of rounds to train")
    flags.DEFINE_integer("iters_per_round", 200, "iterations per round")
    flags.DEFINE_integer("imgs_per_gpu", 256, "image samples per iter per device")
    flags.DEFINE_integer("pixels_per_image", 16, "pixel samples per image")
    flags.DEFINE_boolean("reset_steps", True, "reset loss schedule steps on load")
    flags.DEFINE_boolean("no_loss_mask", False, "disable loss masking")

    # efficiency-related
    flags.DEFINE_integer("ngpu", 1, "number of devices (data-parallel mesh size)")
    flags.DEFINE_integer("num_workers", 0, "dataloader workers")
    flags.DEFINE_integer("eval_res", 128, "resolution for eval visualizations")
    flags.DEFINE_integer("save_freq", 10, "checkpoint frequency in rounds")
    flags.DEFINE_boolean("profile", False, "profile the training loop")


class GaussianConfig:
    # Stage-3 gaussian-surfel options (config.py:154-238)
    flags.DEFINE_boolean("gs_optim_warp", True, "jointly refine the warp field")
    flags.DEFINE_boolean("gs_learnable_bg", True, "learnable background color")
    flags.DEFINE_float("intrinsics_lr_mult", 1.0, "intrinsics lr multiplier")
    flags.DEFINE_float("arap_wt", 0.0, "ARAP regularization weight")
    flags.DEFINE_boolean("rgb_loss_only", False, "train with rgb loss only")
    flags.DEFINE_boolean("quant_exp", False, "quantitative-eval frame split")

    # 2dgs
    flags.DEFINE_boolean("force_center_cam", False, "force centered principal point")
    flags.DEFINE_boolean("reg_in_cano", False, "2dgs reg in canonical space")
    flags.DEFINE_float("lambda_dist", 0.0, "distortion loss weight")
    flags.DEFINE_float("lambda_normal", 0.05, "normal consistency loss weight")
    flags.DEFINE_float("reg_volume_loss_wt", 0.0, "surfel volume loss weight")
    flags.DEFINE_boolean("maskloss_no_vis2d", False, "")

    flags.DEFINE_integer("sh_degree", 3, "SH degree")
    flags.DEFINE_boolean("white_background", False, "")

    # optimization (per-tensor GS learning rates)
    flags.DEFINE_integer("iterations", 30000, "")
    flags.DEFINE_float("position_lr_init", 0.00005, "")
    flags.DEFINE_float("position_lr_final", 0.0000016, "")
    flags.DEFINE_float("position_lr_delay_mult", 0.01, "")
    flags.DEFINE_integer("position_lr_max_steps", 30000, "")
    flags.DEFINE_float("feature_lr", 0.0025, "")
    flags.DEFINE_float("opacity_lr", 0.05, "")
    flags.DEFINE_float("scaling_lr", 0.005, "")
    flags.DEFINE_float("rotation_lr", 0.001, "")
    flags.DEFINE_float("regist_feat_lr", 0.0025, "")

    flags.DEFINE_float("percent_dense", 0.01, "")
    flags.DEFINE_float("lambda_dssim", 0.0, "")
    flags.DEFINE_integer("densification_interval", 100, "")
    flags.DEFINE_integer("opacity_reset_interval", 3000, "")
    flags.DEFINE_integer("outlier_filtering_interval", 2000, "")
    flags.DEFINE_integer("outlier_stop_iter", 29000, "")
    flags.DEFINE_integer("densify_from_iter", 500, "")
    flags.DEFINE_integer("densify_until_iter", 15000, "")
    flags.DEFINE_float("densify_grad_threshold", 0.0002, "")
    flags.DEFINE_string("gs_init_mesh", "", "init mesh")
    flags.DEFINE_string("gs_init_ply", "", "init ply")

    # surfel store capacity (TPU fixed-capacity store; not in reference)
    flags.DEFINE_integer("gs_capacity", 400000, "max live surfels")

    # rasterizer backend knobs (TPU-specific; not in reference)
    flags.DEFINE_integer("raster_tile", 16, "raster tile size")
    flags.DEFINE_integer("raster_span_cap", 4, "per-splat tile-span cap")
    flags.DEFINE_integer("raster_budget", 1024, "XLA-tiles entry budget")
    flags.DEFINE_integer("raster_tile_chunk", 16, "tiles per lax.map step (XLA backend)")
    flags.DEFINE_string("raster_impl", "",
                        "tiles | naive | pallas_grad; empty = auto "
                        "(fused Pallas kernels on single-chip TPU - measured "
                        "3.5x faster than tiles at 200k/256^2 with true host-"
                        "fetch timing; tiles on CPU and under a mesh)")


class ReferenceCompatConfig:
    """Remaining reference flags (`lab4d/config.py:75-238`) accepted so that
    a reference-produced `opts.log` parses unchanged. Most are vestigial
    (gen3d SDS / two_branch GSDF / flexicubes — broken upstream paths per
    SURVEY.md §1) or CUDA-specific (data_device, debug_cuda); none are read
    by the TPU build unless noted in COMPONENTS.md."""

    flags.DEFINE_integer("tet_grid_size", 80, "")
    flags.DEFINE_boolean("freeze_warp", False, "")
    flags.DEFINE_boolean("test_in_train", False, "")
    flags.DEFINE_boolean("recon_keep_coarse", False, "")
    flags.DEFINE_boolean("gen3d_optim_all", False, "")
    flags.DEFINE_float("top_alpha", 1, "")
    flags.DEFINE_float("gs", 50.0, "")
    flags.DEFINE_string("gen3d_guidance", "mvd", "")
    flags.DEFINE_boolean("recon_no_coarsetofine", False, "")
    flags.DEFINE_float("gen3d_wt", 0, "")
    flags.DEFINE_integer("gen3d_res", 64, "")
    flags.DEFINE_float("gen3d_dist", 1, "")
    flags.DEFINE_float("gen3d_freq", 2, "")
    flags.DEFINE_integer("gen3d_start_iters", 0, "")
    flags.DEFINE_boolean("gen3d_dirprompt", False, "")
    flags.DEFINE_boolean("render_uncert", False, "")
    flags.DEFINE_integer("gen3d_frameid", -1, "")
    flags.DEFINE_integer("seed", -1, "")
    flags.DEFINE_boolean("gen3d_random_bkgd", False, "")
    flags.DEFINE_string("prompt", "A_photo_of_a_cat", "")
    flags.DEFINE_boolean("reset_rgb_mlp", False, "")
    flags.DEFINE_float("gen3d_sds_t_max", 0.98, "")
    flags.DEFINE_boolean("rgb_only", False, "")
    flags.DEFINE_boolean("geo_only", False, "")
    flags.DEFINE_boolean("gen3d_regloss", False, "")
    flags.DEFINE_boolean("gen3d_jacobloss", False, "")
    flags.DEFINE_boolean("gen3d_cycloss", False, "")
    flags.DEFINE_boolean("gen3d_sds_normal", False, "")
    flags.DEFINE_integer("lock_frameid", -1, "")
    flags.DEFINE_string("lab4d_init_mesh", "", "")
    flags.DEFINE_boolean("freeze_bone_len", False, "")
    flags.DEFINE_boolean("debug_cuda", False, "")
    flags.DEFINE_boolean("use_gs_optimizer", False, "")
    flags.DEFINE_boolean("not_load_warping", False, "")
    flags.DEFINE_boolean("two_branch", False, "")
    flags.DEFINE_integer("dgs_k", 4, "")
    flags.DEFINE_integer("neus_branch_reso", 64, "")
    flags.DEFINE_integer("optim_warp_neus_iters", 12000, "")
    flags.DEFINE_integer("start_mutual_iters", 999999, "")
    flags.DEFINE_float("mutual_depth_wt", 1, "")
    flags.DEFINE_float("mutual_normal_wt", 1, "")
    flags.DEFINE_float("mutual_mask_wt", 1, "")
    flags.DEFINE_bool("depth_guide_sample", False, "")
    flags.DEFINE_integer("novel_neus_interv", -1, "")
    flags.DEFINE_boolean("vis2d_dilate", False, "")
    # gs fork viewer/trainer args bridged into absl (`gs/arguments`)
    flags.DEFINE_string("ip", "127.0.0.1", "")
    flags.DEFINE_integer("port", 6322, "")
    flags.DEFINE_integer("debug_from", -1, "")
    flags.DEFINE_boolean("detect_anomaly", False, "")
    flags.DEFINE_list("test_iterations", [7000, 30000], "")
    flags.DEFINE_list("save_iterations", [7000, 30000], "")
    flags.DEFINE_boolean("quiet", False, "")
    flags.DEFINE_list("checkpoint_iterations", [30000], "")
    flags.DEFINE_string("start_checkpoint", "", "")
    flags.DEFINE_string("source_path", "", "")
    flags.DEFINE_string("model_path", "", "")
    flags.DEFINE_string("images", "images", "")
    flags.DEFINE_integer("resolution", -1, "")
    flags.DEFINE_string("data_device", "cuda", "")
    flags.DEFINE_boolean("eval", False, "")
    flags.DEFINE_boolean("debug", False, "")
    flags.DEFINE_boolean("random_background", False, "")
    flags.DEFINE_float("resolution_scale", 2, "")


def define_flag_once(kind: str, name: str, default, help_str: str):
    """Define a flag unless it already exists (render/export/reanimate share
    some flag names and may be imported together)."""
    if name in opts:
        return
    getattr(flags, f"DEFINE_{kind}")(name, default, help_str)


def get_config():
    return opts.flag_values_dict()


def save_config():
    save_dir = os.path.join(opts.logroot, "%s-%s" % (opts.seqname, opts.logname))
    os.makedirs(save_dir, exist_ok=True)
    opts_path = os.path.join(save_dir, "opts.log")
    if os.path.exists(opts_path):
        os.remove(opts_path)
    opts.append_flags_into_file(opts_path)


def load_flags_from_file(path: str):
    """Read a flagfile (opts.log) into the global flags."""
    opts.read_flags_from_files(["--flagfile=%s" % path])
