#pragma once
/* imgproc API lives in the core shim (minimat) */
