"""Model predictive control: the jitted receding-horizon agent."""

from ppi_tpu.mpc.agent import Mpc, MpcCarry
from ppi_tpu.mpc.metrics import fft_smoothness, signal_power
