from tokenflow_tpu.diffusion.ddim import (
    DDIMSchedule,
    make_schedule,
    ddim_step,
    ddim_invert_step,
    add_noise,
    pred_x0_from_eps,
)
