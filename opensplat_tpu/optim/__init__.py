from .adam import AdamState, adam_init, adam_update, means_lr_schedule
