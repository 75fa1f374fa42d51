import sys

from tsta_tpu.cli import main

sys.exit(main())
