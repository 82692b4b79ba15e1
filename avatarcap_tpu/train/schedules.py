"""Learning-rate schedules (reference utils/lr_schedule.py:1-63)."""

from __future__ import annotations


class ConstantSchedule:
    def __init__(self, value: float):
        self.value = value

    def __call__(self, step: int) -> float:
        return self.value


class StepSchedule:
    """Geometric decay every ``interval`` steps (reference :14-22)."""

    def __init__(self, initial: float, interval: int, factor: float):
        self.initial = initial
        self.interval = interval
        self.factor = factor

    def __call__(self, step: int) -> float:
        return self.initial * (self.factor ** (step // self.interval))


class WarmupSchedule:
    """Linear warmup then constant (reference :25-34)."""

    def __init__(self, initial: float, warmed_up: float, length: int):
        self.initial = initial
        self.warmed_up = warmed_up
        self.length = length

    def __call__(self, step: int) -> float:
        if step > self.length:
            return self.warmed_up
        return self.initial + (self.warmed_up - self.initial) \
            * step / self.length


def get_learning_rate_schedule(kind: str, **kwargs):
    """Keyword-validated factory (reference :37-63)."""
    if kind == "Step":
        for k in ("Initial", "Interval", "Factor"):
            assert k in kwargs, f'Missing keyword argument "{k}"'
        return StepSchedule(kwargs["Initial"], kwargs["Interval"],
                            kwargs["Factor"])
    if kind == "Warmup":
        for k in ("Initial", "Final", "Length"):
            assert k in kwargs, f'Missing keyword argument "{k}"'
        return WarmupSchedule(kwargs["Initial"], kwargs["Final"],
                              kwargs["Length"])
    if kind == "Constant":
        assert "Value" in kwargs, 'Missing keyword argument "Value"'
        return ConstantSchedule(kwargs["Value"])
    raise ValueError(f'Unknown learning rate schedule type "{kind}"! '
                     'Must be "Step", "Warmup" or "Constant".')
