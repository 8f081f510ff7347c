"""Stage-4 global reconstruction: data init, forward graph, losses, optimizer."""
from .data_init import BatchedPersons, PersonData, batch_persons, init_batched, init_person
from .forward import ReconFlags, recon_forward
from .losses import compute_losses, gmof, loss_func_dict
from .optimizer import GlobalReconOptimizer

model_dict = {"global_recon_model": GlobalReconOptimizer}

__all__ = [k for k in dir() if not k.startswith("_")]
