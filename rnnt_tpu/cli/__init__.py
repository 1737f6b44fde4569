"""Command-line entry points (ref: run_rnnt.py, preprocess_*.py,
transcribe_file.py, streaming_transcribe.py, quantize_model.py)."""
