"""Error taxonomy: the sim/src/error.rs + parsing_error.rs equivalents."""

from __future__ import annotations


class SimError(Exception):
    """Engine-level failure (sim/src/error.rs SimError)."""


class SimInitializationError(SimError):
    """World/initialisation failure (SimError::InitializationError)."""


class SimulationRuntimeError(SimError):
    """Failure inside the step loop (SimError::Simulation)."""


class DataLoadingError(Exception):
    """Data-layer failure (load_census_data parsing_error.rs taxonomy)."""


class ValueParsingError(DataLoadingError):
    pass


class MissingDataError(DataLoadingError):
    pass


class MismatchedDataError(DataLoadingError):
    def __init__(self, message, value_1=None, value_2=None):
        super().__init__(f"{message}: {value_1!r} vs {value_2!r}")
        self.value_1, self.value_2 = value_1, value_2
