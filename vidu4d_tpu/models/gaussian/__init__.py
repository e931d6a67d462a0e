from vidu4d_tpu.models.gaussian.surfels import SurfelParams, SurfelState, init_from_points
from vidu4d_tpu.models.gaussian.optimizer import GsAdamState, gs_adam_init, gs_adam_update, GsLearningRates
from vidu4d_tpu.models.gaussian.densify import densify_and_prune, reset_opacity, DensifyConfig
