"""Standalone forcing subsystem (reference `mpas_seaice_forcing.F` +
the external MPAS_forcing framework it uses)."""

from .clock import ModelClock
from .core import (ForcingSeries, CoreAtmosForcing, NcarOceanForcing,
                   derive_atmos_fields, shortwave_split,
                   longwave_rosati_miyakoda,
                   longwave_parkinson_washington, shortwave_down,
                   limit_specific_humidity, split_precipitation)
