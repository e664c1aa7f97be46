"""Host-side utilities: safetensors I/O, WAV codec, DSP, bucketing."""
