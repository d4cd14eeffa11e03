from lfm_tpu.ode.solvers import (
    ADAPTIVE_SOLVERS,
    FIXED_SOLVERS,
    ODEResult,
    karras_sample,
    karras_sigmas,
    odeint,
    sample_euler_karras,
    sample_heun_karras,
)
from lfm_tpu.ode.flow import SIGMA_MIN, fm_loss, interpolate
from lfm_tpu.ode.cfg import cfg_velocity, plain_velocity
