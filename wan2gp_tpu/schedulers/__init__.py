from .base import Schedule, make_schedule, init_solver_state, solver_step
