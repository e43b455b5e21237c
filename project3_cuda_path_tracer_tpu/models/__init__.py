from .inverse import (  # noqa: F401
    RenderParams, render_image, mse_loss, make_train_step, InverseRenderer,
)
