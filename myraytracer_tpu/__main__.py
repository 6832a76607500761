import sys

from myraytracer_tpu.cli import main

sys.exit(main())
