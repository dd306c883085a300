from pathtracerwithcuda_tpu.diff.gradients import render_loss_and_grad
from pathtracerwithcuda_tpu.diff.inverse import InverseRenderer, make_train_step

__all__ = ["render_loss_and_grad", "InverseRenderer", "make_train_step"]
