"""Skeleton articulation: predefined kinematic trees + FK + skeleton MLP.

Re-design of `lab4d/utils/skel_utils.py` + `lab4d/nnutils/pose.py:326-568`
(ArticulationSkelMLP): a predefined human (18-bone) or quadruped (25-bone)
skeleton, per-frame joint axis-angles from a time MLP, per-instance bone
lengths with left/right symmetry averaging, forward kinematics to
bone-to-object dual quaternions. The FK loop is a static python loop over
the (topologically ordered) edge table — at <=25 bones it unrolls cleanly
under jit.

The rest-joint coordinate tables are data constants from the reference
(`skel_utils.py:140-345`), converted GL->CV as there.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.fields.mlp import CondMLP
from vidu4d_tpu.models.fields.time_mlp import Head, TimeMLPTrunk
from vidu4d_tpu.ops.geometry import so3_to_exp_map
from vidu4d_tpu.ops.quaternion import (
    DualQuaternion,
    dual_quaternion_to_quaternion_translation,
    matrix_to_quaternion,
    quaternion_translation_to_dual_quaternion,
)

# joint -> parent tables (1-indexed; 0 = fixed base), topologically ordered
HUMAN_PARENT = {
    1: 0, 13: 0, 16: 0, 2: 1, 3: 2, 4: 3, 5: 3, 9: 3, 6: 5, 7: 6, 8: 7,
    10: 9, 11: 10, 12: 11, 14: 13, 15: 14, 17: 16, 18: 17,
}
HUMAN_SYMM = {1: 1, 2: 2, 3: 3, 4: 4, 5: 9, 6: 10, 7: 11, 8: 12, 9: 5,
              10: 6, 11: 7, 12: 8, 13: 16, 14: 17, 15: 18, 16: 13, 17: 14,
              18: 15}
QUAD_PARENT = {
    1: 0, 13: 0, 18: 0, 22: 0, 2: 1, 3: 2, 4: 3, 5: 3, 9: 3, 6: 5, 7: 6,
    8: 7, 10: 9, 11: 10, 12: 11, 14: 13, 15: 14, 16: 15, 17: 16, 19: 18,
    20: 19, 21: 20, 23: 22, 24: 23, 25: 24,
}
QUAD_SYMM = {1: 1, 2: 2, 3: 3, 4: 4, 5: 9, 6: 10, 7: 11, 8: 12, 9: 5,
             10: 6, 11: 7, 12: 8, 13: 13, 14: 14, 15: 15, 16: 16, 17: 17,
             18: 22, 19: 23, 20: 24, 21: 25, 22: 18, 23: 19, 24: 20, 25: 21}

# rest joints incl. the base row 0 (GL coords; data from skel_utils.py)
_HUMAN_REST = np.array([
    [0.0, 0.0, 0.0],
    [-3.6278e-05, 3.6903e-03, -7.2475e-04],
    [-9.3221e-05, 8.0693e-03, -1.1619e-03],
    [-1.2457e-04, 1.3251e-02, -1.3801e-03],
    [-6.0306e-05, 1.8105e-02, -7.8039e-04],
    [2.2711e-03, 1.6784e-02, -8.8300e-04],
    [7.1616e-03, 1.6918e-02, -1.6573e-03],
    [1.7433e-02, 1.6934e-02, -1.7350e-03],
    [2.7266e-02, 1.6963e-02, -1.7920e-03],
    [-2.4980e-03, 1.6817e-02, -9.5435e-04],
    [-7.4151e-03, 1.6886e-02, -1.9168e-03],
    [-1.7819e-02, 1.6867e-02, -1.7721e-03],
    [-2.7194e-02, 1.6867e-02, -1.6701e-03],
    [3.4517e-03, -2.5785e-03, 4.9599e-04],
    [3.3529e-03, -1.8460e-02, 2.0430e-04],
    [3.3907e-03, -3.4376e-02, -7.4148e-04],
    [-3.4360e-03, -2.6853e-03, 2.9919e-05],
    [-3.3118e-03, -1.8488e-02, 2.1094e-04],
    [-3.3864e-03, -3.4373e-02, -7.9789e-04],
], np.float32) * 2.5

_QUAD_REST = np.array([
    [0.0, 0.01, 0.03],
    [-9.3610e-05, 1.0187e-03, -2.1873e-02],
    [-5.4921e-05, 1.7428e-03, -9.3399e-03],
    [-8.7874e-05, 2.8378e-03, 4.7383e-03],
    [-6.6505e-05, 1.9184e-02, 1.9050e-02],
    [6.6107e-03, 8.1839e-03, 1.1086e-02],
    [9.1702e-03, -7.7618e-03, 1.0090e-02],
    [1.0476e-02, -2.7165e-02, 6.9399e-03],
    [1.1353e-02, -3.5803e-02, 1.1250e-02],
    [-6.9130e-03, 8.2406e-03, 1.1061e-02],
    [-9.5720e-03, -7.6817e-03, 1.0104e-02],
    [-1.0856e-02, -2.7090e-02, 7.0649e-03],
    [-1.1773e-02, -3.5696e-02, 1.1439e-02],
    [3.2358e-05, 6.6986e-03, -4.5738e-02],
    [9.5675e-05, 3.9485e-03, -5.4802e-02],
    [1.6878e-04, 3.1219e-03, -6.3845e-02],
    [2.2074e-04, 4.3004e-03, -7.3049e-02],
    [2.0674e-04, 6.3312e-03, -8.2086e-02],
    [7.4309e-03, -2.5624e-03, -3.3335e-02],
    [7.9435e-03, -1.7319e-02, -3.6508e-02],
    [8.1728e-03, -2.8493e-02, -3.9845e-02],
    [8.5748e-03, -3.3565e-02, -3.7078e-02],
    [-7.5478e-03, -2.5571e-03, -3.3397e-02],
    [-8.2738e-03, -1.7257e-02, -3.6706e-02],
    [-8.6677e-03, -2.8381e-02, -4.0128e-02],
    [-9.1048e-03, -3.3482e-02, -3.7373e-02],
], np.float32)


def get_predefined_skeleton(skel_type: str):
    """Returns (rest_joints (B, 3) CV coords, edges dict, symm_idx list)
    (`skel_utils.py:140-357`)."""
    if skel_type == "human":
        rest, edges, symm = _HUMAN_REST.copy(), HUMAN_PARENT, HUMAN_SYMM
    elif skel_type == "quad":
        rest, edges, symm = _QUAD_REST.copy(), QUAD_PARENT, QUAD_SYMM
    else:
        raise ValueError(f"unknown skeleton {skel_type!r}")
    rest[:, 1:] *= -1  # GL -> CV
    # drop the base row, translate remaining joints by the base
    rest = rest[1:] + rest[:1]
    symm_idx = [v - 1 for v in symm.values()]
    return rest, edges, symm_idx


def get_valid_edges(edges: Dict[int, int]):
    idx = np.asarray(list(edges.keys()))
    parent = np.asarray(list(edges.values()))
    keep = parent > 0
    return idx[keep] - 1, parent[keep] - 1


def rest_joints_to_local(rest_joints: jax.Array, edges: Dict[int, int]) -> jax.Array:
    """local = child - parent for non-root joints (`skel_utils.py:35-47`)."""
    idx, parent = get_valid_edges(edges)
    return rest_joints.at[idx].set(rest_joints[idx] - rest_joints[parent])


def fk_se3(local_rest_joints: jax.Array, so3: jax.Array,
           edges: Dict[int, int], to_dq: bool = True):
    """Forward kinematics (`skel_utils.py:50-99`).

    Args:
        local_rest_joints: (..., B, 3); so3: (..., B, 3) joint axis-angles.
    Returns:
        dual quaternions ((..., B, 4), (..., B, 4)) or (..., B, 4, 4).
    """
    rot = so3_to_exp_map(so3)  # (..., B, 3, 3)
    trans = local_rest_joints

    glob_r = [None] * rot.shape[-3]
    glob_t = [None] * rot.shape[-3]
    for idx, parent in edges.items():
        i = idx - 1
        r_i = rot[..., i, :, :]
        t_i = trans[..., i, :]
        if parent > 0:
            pr, pt = glob_r[parent - 1], glob_t[parent - 1]
            glob_r[i] = pr @ r_i
            glob_t[i] = jnp.einsum("...ij,...j->...i", pr, t_i) + pt
        else:
            glob_r[i] = r_i
            glob_t[i] = t_i
    r = jnp.stack(glob_r, axis=-3)
    t = jnp.stack(glob_t, axis=-2)
    if to_dq:
        quat = matrix_to_quaternion(r)
        return quaternion_translation_to_dual_quaternion(quat, t)
    rt = jnp.zeros(r.shape[:-2] + (4, 4), r.dtype)
    rt = rt.at[..., :3, :3].set(r).at[..., :3, 3].set(t).at[..., 3, 3].set(1.0)
    return rt


def shift_joints_to_bones(joints: jax.Array, edges: Dict[int, int]) -> jax.Array:
    """Joint locations -> bone centers (`skel_utils.py:122-138`)."""
    idx, parent = get_valid_edges(edges)
    center = (joints[..., parent, :] + joints[..., idx, :]) / 2.0
    joints = joints.at[..., parent, :].set(center)
    for i in sorted(set(parent.tolist())):
        sel = parent == i
        if sel.sum() > 1:
            joints = joints.at[..., i, :].set(
                jnp.mean(center[..., sel, :], axis=-2)
            )
    return joints


def shift_joints_to_bones_dq(dq: DualQuaternion, edges: Dict[int, int],
                             shift: Optional[jax.Array] = None) -> DualQuaternion:
    quat, joints = dual_quaternion_to_quaternion_translation(dq)
    if shift is not None:
        joints = joints + shift.reshape((1,) * (joints.ndim - 1) + (3,))
    joints = shift_joints_to_bones(joints, edges)
    return quaternion_translation_to_dual_quaternion(quat, joints)


class ArticulationSkelMLP(nn.Module):
    """Skeleton articulation over time (`pose.py:326-568`)."""

    frame_info: FrameInfo
    skel_type: str = "quad"
    depth: int = 5
    width: int = 256
    num_freq_t: int = 6

    def setup(self):
        rest, edges, symm_idx = get_predefined_skeleton(self.skel_type)
        self.edges = edges
        self._symm_idx = tuple(symm_idx)
        self._rest_joints = jnp.asarray(rest)
        self.num_se3 = len(rest)
        num_inst = self.frame_info.num_vids

        self.time_mlp = TimeMLPTrunk(
            frame_info=self.frame_info, depth=self.depth, width=self.width,
            num_freq_t=self.num_freq_t,
        )
        self.so3_head = Head(3 * self.num_se3, hidden=self.width // 2)
        self.logscale = self.param("logscale", nn.initializers.zeros, (1,))
        self.shift = self.param("shift", nn.initializers.zeros, (3,))
        self.log_bone_len = CondMLP(
            num_inst=num_inst, depth=2, width=64, out_channels=self.num_se3
        )

    def compute_rel_rest_joints(self, inst_id=None, override_log_bone_len=None):
        """(`pose.py:466-494`)."""
        rel = rest_joints_to_local(self._rest_joints, self.edges)[None]
        n = 1 if inst_id is None else inst_id.shape[0]
        rel = jnp.broadcast_to(rel, (n,) + rel.shape[1:])
        # constant 1-dim input (the reference feeds a 0-dim tensor into an
        # empty MLP, which degenerates for single-instance models)
        const = jnp.ones((n, 1))
        if override_log_bone_len is not None:
            inc = override_log_bone_len
        else:
            inc = self.log_bone_len(const, inst_id)
        bone_len = jnp.exp(inc + self.logscale)
        bone_len = (bone_len + bone_len[..., np.asarray(self._symm_idx)]) / 2.0
        return rel * bone_len[..., None]

    def _so3(self, t_feat):
        return self.so3_head(t_feat).reshape(t_feat.shape[:-1] + (self.num_se3, 3))

    def _fk(self, so3, local_rest_joints):
        dq = fk_se3(local_rest_joints, so3, self.edges)
        return shift_joints_to_bones_dq(dq, self.edges, shift=self.shift)

    def __call__(self, frame_id=None, override_so3=None) -> DualQuaternion:
        if frame_id is None:
            frame_id = jnp.asarray(self.frame_info.frame_mapping)
        inst_id = self.time_mlp.vid_of(frame_id)
        if override_so3 is None:
            so3 = self._so3(self.time_mlp(frame_id))
        else:
            so3 = override_so3
        local = self.compute_rel_rest_joints(inst_id=inst_id)
        return self._fk(so3, local)

    def so3_at(self, frame_id=None):
        if frame_id is None:
            frame_id = jnp.asarray(self.frame_info.frame_mapping)
        return self._so3(self.time_mlp(frame_id))

    def mean_vals(self) -> DualQuaternion:
        so3 = self._so3(self.time_mlp.mean_feat())
        local = self.compute_rel_rest_joints()
        return self._fk(so3, local)

    def vals_and_mean(self, frame_id=None):
        pred_t = self(frame_id)
        pred_mean = self.mean_vals()
        pred_mean = (
            jnp.broadcast_to(pred_mean[0], pred_t[0].shape),
            jnp.broadcast_to(pred_mean[1], pred_t[1].shape),
        )
        return pred_t, pred_mean

    def skel_prior_loss(self):
        """L2 on mean joint angles + 0.02 x L2 on bone-length increments
        (`pose.py:569-600`)."""
        so3 = self._so3(self.time_mlp.mean_feat())
        loss_so3 = jnp.mean(so3 ** 2)
        inc = self.log_bone_len(jnp.ones((1, 1)), None)
        return loss_so3 + 0.02 * jnp.mean(inc ** 2)
