from .model import apply_model, init_model, loss_fn, total_loss, ENCODERS

__all__ = ["apply_model", "init_model", "loss_fn", "total_loss", "ENCODERS"]
