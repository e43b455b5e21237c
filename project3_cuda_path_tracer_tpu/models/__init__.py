from .inverse import (  # noqa: F401
    RenderParams, render_image, mse_loss, unbiased_mse_grad_loss,
    make_train_step, InverseRenderer,
)
