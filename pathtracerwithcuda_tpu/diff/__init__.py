from pathtracerwithcuda_tpu.diff.edges import (
    edge_surrogate,
    sphere_edge_surrogate,
    triangle_edge_surrogate,
)
from pathtracerwithcuda_tpu.diff.gradients import render_loss_and_grad
from pathtracerwithcuda_tpu.diff.inverse import (
    InverseRenderer,
    init_params,
    make_train_step,
)

__all__ = ["render_loss_and_grad", "InverseRenderer", "make_train_step",
           "init_params", "edge_surrogate", "sphere_edge_surrogate",
           "triangle_edge_surrogate"]
