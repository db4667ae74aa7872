from .stepper import make_frame_step, make_rollout, integrate_substep  # noqa: F401
