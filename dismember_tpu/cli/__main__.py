import sys

from dismember_tpu.cli.main import main

sys.exit(main())
