"""Campaign trainer wrapper: unbuffered-friendly + periodic stack dumps.

Runs rnnt_tpu.cli.run_rnnt.main with faulthandler dumping all thread stacks
to stderr every 5 minutes, so a stall (e.g. a long tunnel compile vs a wedge)
is diagnosable from the log. Not part of the framework — campaign tooling.
"""
import faulthandler
import sys

faulthandler.enable()
faulthandler.dump_traceback_later(300, repeat=True)

from rnnt_tpu.cli.run_rnnt import main  # noqa: E402

main(sys.argv[1:])
