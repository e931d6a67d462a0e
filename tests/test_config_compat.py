"""Reference flagfile compatibility (`lab4d/config.py:75-238`).

A reference training run appends its full ~138-flag surface to opts.log and
render/export re-read it via --flagfile; the TPU CLIs must parse such a file
unchanged. The literal below is a reference-produced opts.log reconstructed
from the reference's own flag declarations (names, defaults, types).
"""

import subprocess
import sys

REFERENCE_OPTS_LOG = """\
--tet_grid_size=80
--freeze_warp=false
--test_in_train=false
--recon_keep_coarse=false
--gen3d_optim_all=false
--top_alpha=1
--gs=50.0
--gen3d_guidance=mvd
--recon_no_coarsetofine=false
--gen3d_wt=0
--gen3d_res=64
--gen3d_dist=1
--gen3d_freq=2
--gen3d_start_iters=0
--gen3d_dirprompt=false
--render_uncert=false
--gen3d_frameid=-1
--seed=-1
--gen3d_random_bkgd=false
--prompt=A_photo_of_a_cat
--reset_rgb_mlp=false
--gen3d_sds_t_max=0.98
--rgb_only=false
--geo_only=false
--gen3d_regloss=false
--gen3d_jacobloss=false
--gen3d_cycloss=false
--gen3d_sds_normal=false
--num_rounds=20
--lock_frameid=-1
--mask_wt=0.1
--rgb_wt=0.1
--depth_wt=1e-4
--flow_wt=0.5
--vis_wt=1e-2
--feature_wt=1e-2
--feat_reproj_wt=5e-2
--reg_visibility_wt=1e-4
--reg_eikonal_wt=1e-3
--reg_deform_cyc_wt=0.01
--reg_delta_skin_wt=5e-3
--reg_skin_entropy_wt=5e-4
--reg_gauss_skin_wt=1e-3
--reg_cam_prior_wt=0.1
--reg_skel_prior_wt=0.1
--reg_gauss_mask_wt=0.01
--reg_soft_deform_wt=100.0
--field_type=fg
--fg_motion=gs-bob
--single_inst=true
--seqname=cat
--logname=tmp
--data_prefix=crop
--train_res=256
--logroot=logdir/
--load_suffix=
--feature_type=dinov2
--load_path=
--lab4d_init_mesh=
--learning_rate=5e-4
--iters_per_round=200
--imgs_per_gpu=1
--pixels_per_image=4096
--freeze_bone_len=false
--reset_steps=true
--no_loss_mask=false
--ngpu=1
--num_workers=8
--eval_res=128
--save_freq=10
--profile=false
--debug_cuda=false
--use_gs_optimizer=false
--gs_optim_warp=true
--gs_learnable_bg=true
--intrinsics_lr_mult=1
--arap_wt=0.0
--rgb_loss_only=false
--quant_exp=false
--not_load_warping=false
--two_branch=false
--dgs_k=4
--neus_branch_reso=64
--optim_warp_neus_iters=12000
--start_mutual_iters=999999
--mutual_depth_wt=1
--mutual_normal_wt=1
--mutual_mask_wt=1
--depth_guide_sample=false
--novel_neus_interv=-1
--force_center_cam=false
--reg_in_cano=false
--lambda_dist=0
--lambda_normal=0.05
--reg_volume_loss_wt=0.00
--maskloss_no_vis2d=false
--vis2d_dilate=false
--ip=127.0.0.1
--port=6322
--debug_from=-1
--detect_anomaly=false
--test_iterations=7000,30000
--save_iterations=7000,30000
--quiet=false
--checkpoint_iterations=30000
--start_checkpoint=
--sh_degree=3
--source_path=
--model_path=
--images=images
--resolution=-1
--white_background=false
--data_device=cuda
--eval=false
--debug=false
--iterations=30000
--position_lr_init=0.00005
--position_lr_final=0.0000016
--position_lr_delay_mult=0.01
--position_lr_max_steps=30000
--feature_lr=0.0025
--opacity_lr=0.05
--scaling_lr=0.005
--rotation_lr=0.001
--regist_feat_lr=0.0025
--percent_dense=0.01
--lambda_dssim=0
--densification_interval=100
--opacity_reset_interval=3000
--outlier_filtering_interval=2000
--outlier_stop_iter=29000
--densify_from_iter=500
--densify_until_iter=15000
--densify_grad_threshold=0.0002
--random_background=false
--gs_init_mesh=
--gs_init_ply=
--resolution_scale=2
"""


def test_reference_opts_log_parses(tmp_path):
    flagfile = tmp_path / "opts.log"
    flagfile.write_text(REFERENCE_OPTS_LOG)
    # fresh interpreter: absl flags are process-global
    code = f"""
import sys
from absl import app
import vidu4d_tpu.config as config

def main(_):
    opts = config.get_config()
    assert opts["fg_motion"] == "gs-bob"
    assert opts["num_rounds"] == 20
    assert abs(opts["depth_wt"] - 1e-4) < 1e-12
    assert opts["tet_grid_size"] == 80  # compat flag accepted
    print("OK")

sys.argv = ["prog", "--flagfile={flagfile}"]
app.run(main)
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
