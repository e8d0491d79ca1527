from .gru import (GRUParams, gru_init, gru_input_proj, gru_cell, gru_step,
                  gru_sequence)

__all__ = ["GRUParams", "gru_init", "gru_input_proj", "gru_cell", "gru_step",
           "gru_sequence"]
