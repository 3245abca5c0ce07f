from .schedules import NoiseSchedule, make_noise_schedule
from .timesteps import SamplingGrid, space_timesteps, replace_duplicate_t, build_sampling_grid
from .samplers import Sampler, get_sampler, pred_xstart, pred_xprev, get_eps_logvar
