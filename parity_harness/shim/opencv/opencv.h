/* Shim for opencv/opencv.h: the star-matching TUs (match.c, atpmatch.c)
 * only reach OpenCV through cvCalculH, the RANSAC homography at the very
 * end of the pipeline. The harness implements it in support.c as a
 * CAPTURE stub: it records the matched star pairs (the C matcher's final
 * output) as the golden payload and returns success — the bundled
 * OpenCV-2 findHomography C++ is out of scope. */
#ifndef SHIM_OPENCV_H
#define SHIM_OPENCV_H

#include "core/siril.h"

struct s_star;
typedef struct s_star s_star;

int cvCalculH(s_star *star_array_img, struct s_star *star_array_ref,
		int n, Homography *H);

#endif
