"""Core DSP numerics for the TPU-native SDR framework."""
