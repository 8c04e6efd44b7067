import sys

from mpc_iris_tpu.cli import main

sys.exit(main())
