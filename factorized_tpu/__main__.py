import sys

from factorized_tpu.cli import main

sys.exit(main())
