from vidu4d_tpu.ops import quaternion, sh, geometry
