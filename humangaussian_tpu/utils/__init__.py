from humangaussian_tpu.utils.schedules import C_schedule

__all__ = ["C_schedule"]
